package graft

import graft.operators.Snapshot
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}

class GraftCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val rootDir: String = {
    val p = Files.createTempDirectory("graft_cat_spec").toString
    // catalogs load lazily on first name reference, reading conf then —
    // set both keys before any gtest.* identifier appears
    spark.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.root", p)
    p
  }

  private def seedFrame: DataFrame =
    (0 until 40).map(i => (i.toLong, s"pay_$i", s"p${i / 10}"))
      .toDF("id", "payload", "part")

  private def rowsOf(df: DataFrame): Set[(Long, String, String)] =
    df.select("id", "payload", "part").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("atomic CTAS: one commit, v1 holds the data, name and path reads agree") {
    val _ = rootDir // force catalog conf before the first gtest.* reference
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.corpus")
    assert(Files.isDirectory(Paths.get(rootDir, "corpus")))
    seedFrame.createOrReplaceTempView("cat_seed")
    spark.sql("CREATE TABLE gtest.corpus.docs USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_seed")
    val dir = s"$rootDir/corpus/docs"
    // ONE commit: the data is in v1, not an empty-create + insert pair
    assert(Snapshot.currentVersion(dir) == 1)
    assert(rowsOf(spark.table("gtest.corpus.docs")) == rowsOf(seedFrame))
    // the same tree is addressable by path — the catalog holds no state
    assert(rowsOf(spark.read.format("graft").load(dir)) == rowsOf(seedFrame))
    assert(spark.sql("SHOW TABLES IN gtest.corpus").collect()
      .map(_.getString(1)).contains("docs"))
    // aggregate pushdown works through the NAME too
    assert(spark.sql("SELECT count(*) AS n FROM gtest.corpus.docs")
      .as[Long].head() == 40L)
  }

  test("CTAS is all-or-nothing: a failing source query leaves no table behind") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.corpus")
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.corpus.broken USING graft " +
        "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
        "AS SELECT CAST(raise_error('boom') AS BIGINT) AS id, " +
        "'x' AS payload, 'p' AS part")
    }
    assert(Snapshot.currentVersion(s"$rootDir/corpus/broken") == 0,
      "aborted CTAS must not leave a committed table")
    assert(!spark.catalog.tableExists("gtest.corpus.broken"))
  }

  test("REPLACE TABLE AS SELECT is a VERSIONED overwrite commit: history preserved, contract immutable, CREATE OR REPLACE creates-or-replaces") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.corpus")
    seedFrame.createOrReplaceTempView("rt_seed")
    spark.sql("CREATE TABLE gtest.corpus.rt USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM rt_seed")
    val dir = s"$rootDir/corpus/rt"
    Seq((100L, "r100", "p0"), (101L, "r101", "p1"))
      .toDF("id", "payload", "part").createOrReplaceTempView("rt_new")
    spark.sql("REPLACE TABLE gtest.corpus.rt USING graft " +
      "AS SELECT * FROM rt_new")
    // one overwrite commit: the replace is a table EVENT, not drop+create
    assert(Snapshot.currentVersion(dir) == 2 &&
      Snapshot.history(dir).last._2 == "overwrite")
    assert(rowsOf(spark.table("gtest.corpus.rt")) ==
      Set((100L, "r100", "p0"), (101L, "r101", "p1")))
    // the pre-replace state stays time-travelable
    assert(rowsOf(Snapshot.readAt(spark, dir, 1)) == rowsOf(seedFrame))
    // the contract is immutable under replace
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE gtest.corpus.rt USING graft " +
        "TBLPROPERTIES ('key'='payload') AS SELECT * FROM rt_new")
    }
    assert(e.toString.contains("key") || e.getMessage.contains("key"))
    assert(Snapshot.currentVersion(dir) == 2, "refused replace must not commit")
    // REPLACE on a missing table refuses; CREATE OR REPLACE creates it
    intercept[Exception] {
      spark.sql("REPLACE TABLE gtest.corpus.rt_missing USING graft " +
        "AS SELECT * FROM rt_new")
    }
    spark.sql("CREATE OR REPLACE TABLE gtest.corpus.rt2 USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM rt_new")
    assert(Snapshot.currentVersion(s"$rootDir/corpus/rt2") == 1)
    // ... and replaces when the table exists
    spark.sql("CREATE OR REPLACE TABLE gtest.corpus.rt2 USING graft " +
      "AS SELECT * FROM rt_seed")
    assert(Snapshot.currentVersion(s"$rootDir/corpus/rt2") == 2 &&
      rowsOf(spark.table("gtest.corpus.rt2")) == rowsOf(seedFrame))
    // plain REPLACE TABLE (no AS SELECT) empties — the truncate commit
    spark.sql("REPLACE TABLE gtest.corpus.rt2 USING graft")
    assert(Snapshot.currentVersion(s"$rootDir/corpus/rt2") == 3 &&
      spark.table("gtest.corpus.rt2").count() == 0L)
    // ... but a DECLARED column list that disagrees refuses — never
    // silently ignored
    intercept[Exception] {
      spark.sql("REPLACE TABLE gtest.corpus.rt2 " +
        "(id BIGINT, other STRING) USING graft")
    }
    assert(Snapshot.currentVersion(s"$rootDir/corpus/rt2") == 3)
    // plain CREATE OR REPLACE on a MISSING table (no AS SELECT)
    // mirrors plain CREATE's empty v1
    spark.sql("CREATE OR REPLACE TABLE gtest.corpus.rt3 " +
      "(id BIGINT, payload STRING, part STRING) USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part')")
    assert(Snapshot.currentVersion(s"$rootDir/corpus/rt3") == 1 &&
      spark.table("gtest.corpus.rt3").count() == 0L)
  }

  test("RTAS redefines schema as ONE replace commit: time travel serves each version's own schema; strict conf restores the refusal") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.corpus")
    seedFrame.createOrReplaceTempView("rte_seed")
    spark.sql("CREATE TABLE gtest.corpus.rte USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM rte_seed")
    val dir = s"$rootDir/corpus/rte"
    // RTAS dropping `payload` and adding `score`: one versioned
    // replace commit, the new schema becomes the table's
    spark.sql("REPLACE TABLE gtest.corpus.rte USING graft " +
      "AS SELECT id, part, CAST(id * 1.5 AS DOUBLE) AS score FROM rte_seed")
    assert(Snapshot.currentVersion(dir) == 2 &&
      Snapshot.history(dir).last._2 == "replace")
    assert(spark.table("gtest.corpus.rte").columns.toSet ==
      Set("id", "part", "score"))
    // time travel ACROSS the replace serves the OLD schema verbatim
    val v1 = Snapshot.readAt(spark, dir, 1)
    assert(v1.columns.toSet == Set("id", "payload", "part"))
    assert(rowsOf(v1) == rowsOf(seedFrame))
    // rollback restores the pre-replace schema with its files
    Snapshot.rollback(spark, dir, 1)
    assert(spark.table("gtest.corpus.rte").columns.toSet ==
      Set("id", "payload", "part"))
    // forward again: merges keep working against the redefined schema
    Snapshot.rollback(spark, dir, 2)
    Snapshot.merge(spark, dir,
      Seq((500L, "p0", 9.5)).toDF("id", "part", "score"),
      Seq.empty[Long].toDF("id"))
    assert(spark.table("gtest.corpus.rte")
      .filter($"id" === 500L).count() == 1)
    // a dropped column referenced by a CHECK refuses with the version
    // untouched; dropping the check first unblocks
    Snapshot.addCheck(spark, dir, "score_pos", "score >= 0")
    val vBefore = Snapshot.currentVersion(dir)
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE gtest.corpus.rte USING graft " +
        "AS SELECT id, part FROM rte_seed")
    }
    assert(e.getMessage.contains("CHECK"))
    assert(Snapshot.currentVersion(dir) == vBefore)
    // the strict conf pins the pre-r15 schema-exact behavior
    spark.conf.set("spark.graft.rtas.strictSchema", "true")
    try {
      val e2 = intercept[Exception] {
        spark.sql("REPLACE TABLE gtest.corpus.rte USING graft " +
          "AS SELECT id, part, score, 'x' AS extra FROM gtest.corpus.rte")
      }
      assert(e2.getMessage.contains("overwrite") ||
        e2.getMessage.contains("strict"))
    } finally spark.conf.unset("spark.graft.rtas.strictSchema")
    spark.sql("DROP TABLE gtest.corpus.rte PURGE")
  }

  test("plain CREATE TABLE commits v1 empty; INSERT/UPDATE/DELETE ride the transactional verbs by name") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.corpus")
    spark.sql("CREATE TABLE gtest.corpus.t2 " +
      "(id BIGINT, payload STRING, part STRING) USING graft " +
      "PARTITIONED BY (part) TBLPROPERTIES ('key'='id')")
    val dir = s"$rootDir/corpus/t2"
    assert(Snapshot.currentVersion(dir) == 1 &&
      spark.table("gtest.corpus.t2").count() == 0)
    spark.sql("INSERT INTO gtest.corpus.t2 VALUES " +
      "(1, 'a', 'p0'), (2, 'b', 'p0'), (3, 'c', 'p1')")
    assert(Snapshot.currentVersion(dir) == 2)
    spark.sql("UPDATE gtest.corpus.t2 SET payload = 'B' WHERE id = 2")
    spark.sql("DELETE FROM gtest.corpus.t2 WHERE id = 3")
    assert(rowsOf(spark.table("gtest.corpus.t2")) ==
      Set((1L, "a", "p0"), (2L, "B", "p0")))
    assert(Snapshot.currentVersion(dir) == 4, "each verb = one commit")
    // missing key property refuses
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.corpus.nokey (id BIGINT, part STRING) " +
        "USING graft PARTITIONED BY (part)")
    }
  }

  test("SQL time travel on catalog tables: VERSION AS OF number/tag, TIMESTAMP AS OF instant; pins refuse writes") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.tt")
    seedFrame.createOrReplaceTempView("cat_seed_tt")
    spark.sql("CREATE TABLE gtest.tt.docs USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_seed_tt")
    val dir = s"$rootDir/tt/docs"
    Snapshot.tag(dir, "first-cut", 1)
    spark.sql("UPDATE gtest.tt.docs SET payload = 'v2' WHERE id = 5")
    assert(Snapshot.currentVersion(dir) == 2)
    // by NUMBER and by TAG: the pre-update state
    assert(spark.sql("SELECT payload FROM gtest.tt.docs VERSION AS OF 1 " +
      "WHERE id = 5").as[String].head() == "pay_5")
    assert(spark.sql("SELECT payload FROM gtest.tt.docs " +
      "VERSION AS OF 'first-cut' WHERE id = 5").as[String].head() == "pay_5")
    // the tip sees the update
    assert(spark.sql("SELECT payload FROM gtest.tt.docs WHERE id = 5")
      .as[String].head() == "v2")
    // TIMESTAMP AS OF v1's own commit instant resolves to v1 (the v2
    // update committed strictly later)
    val at1 = Snapshot.committedAt(dir, 1)
    val ts = java.time.Instant.ofEpochMilli(at1)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace('T', ' ')
    val n1 = spark.sql(s"SELECT payload FROM gtest.tt.docs " +
      s"TIMESTAMP AS OF '$ts' WHERE id = 5").as[String].head()
    assert(n1 == "pay_5" || Snapshot.committedAt(dir, 2) <= at1,
      s"as-of v1's instant must read v1, got '$n1'")
    // unknown tag / future version refuse with clear errors
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.tt.docs VERSION AS OF 'nope'").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.tt.docs VERSION AS OF 99").collect()
    }
    // a pinned reference refuses writes
    intercept[Exception] {
      spark.sql("UPDATE gtest.tt.docs VERSION AS OF 1 SET payload='x' WHERE id = 1")
    }
  }

  test("DROP TABLE refuses while tags pin versions; PURGE overrides; namespace drop honors cascade") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.dropns")
    seedFrame.createOrReplaceTempView("cat_seed2")
    spark.sql("CREATE TABLE gtest.dropns.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_seed2")
    val dir = s"$rootDir/dropns/t"
    Snapshot.tag(dir, "pinned-release", 1)
    val e = intercept[Exception] { spark.sql("DROP TABLE gtest.dropns.t") }
    assert(e.getMessage.contains("pinned-release"))
    assert(Snapshot.currentVersion(dir) == 1, "refused drop must not delete")
    spark.sql("DROP TABLE gtest.dropns.t PURGE")
    assert(Snapshot.currentVersion(dir) == 0 && !Files.exists(Paths.get(dir)))
    // non-empty namespace refuses a bare drop, cascades on request
    spark.sql("CREATE TABLE gtest.dropns.t2 USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_seed2")
    intercept[Exception] { spark.sql("DROP NAMESPACE gtest.dropns") }
    spark.sql("DROP NAMESPACE gtest.dropns CASCADE")
    assert(!Files.exists(Paths.get(s"$rootDir/dropns")))
    // CASCADE must honor the same tag protection DROP TABLE enforces:
    // a namespace holding a tag-pinned table refuses, nothing deleted
    spark.sql("CREATE NAMESPACE gtest.dropns2")
    spark.sql("CREATE TABLE gtest.dropns2.t3 USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_seed2")
    val dir3 = s"$rootDir/dropns2/t3"
    Snapshot.tag(dir3, "pinned-ns", 1)
    val e2 = intercept[Exception] { spark.sql("DROP NAMESPACE gtest.dropns2 CASCADE") }
    assert(e2.getMessage.contains("t3") && e2.getMessage.contains("PURGE"))
    assert(Snapshot.currentVersion(dir3) == 1,
      "refused cascade must not delete the pinned table")
    Snapshot.untag(dir3, "pinned-ns")
    spark.sql("DROP NAMESPACE gtest.dropns2 CASCADE")
    assert(!Files.exists(Paths.get(s"$rootDir/dropns2")))
  }

  test("ALTER TABLE RENAME/DROP COLUMN/ALTER TYPE ride the evolution commits; contract columns refuse") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.evo")
    (0 until 20).map(i => (i.toLong, s"pay_$i", i, s"p${i / 10}"))
      .toDF("id", "payload", "score", "part")
      .createOrReplaceTempView("cat_evo_seed")
    spark.sql("CREATE TABLE gtest.evo.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_evo_seed")
    val dir = s"$rootDir/evo/t"
    // RENAME: metadata-only commit; bytes stay under the old physical
    // name; the tip renders the new name, v1 still the old
    spark.sql("ALTER TABLE gtest.evo.t RENAME COLUMN payload TO body")
    assert(Snapshot.currentVersion(dir) == 2 &&
      Snapshot.history(dir).last._2 == "rename_column(payload->body)")
    assert(spark.table("gtest.evo.t").columns.contains("body"))
    assert(spark.sql("SELECT body FROM gtest.evo.t WHERE id = 3")
      .as[String].head() == "pay_3")
    assert(Snapshot.readAt(spark, dir, 1).columns.contains("payload"),
      "time travel before the rename must render the old name")
    // ALTER TYPE: the proven-safe widening only
    spark.sql("ALTER TABLE gtest.evo.t ALTER COLUMN score TYPE bigint")
    assert(spark.table("gtest.evo.t").schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evo.t ALTER COLUMN score TYPE int")
    }
    // DROP: metadata-only; the column leaves the tip, not v1
    spark.sql("ALTER TABLE gtest.evo.t DROP COLUMN body")
    assert(!spark.table("gtest.evo.t").columns.contains("body"))
    assert(Snapshot.readAt(spark, dir, 2).columns.contains("body"))
    // contract columns refuse inside the commit, version untouched
    val v = Snapshot.currentVersion(dir)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evo.t RENAME COLUMN id TO doc")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evo.t DROP COLUMN part")
    }
    // NOT NULL adds refuse (existing rows would violate it instantly)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evo.t ADD COLUMN extra STRING NOT NULL")
    }
    assert(Snapshot.currentVersion(dir) == v, "refusals must not commit")
  }

  test("ALTER TABLE ADD COLUMN: empty evolution commit — old files null-fill, a merge backfills, re-add never resurrects") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.addc")
    (0 until 20).map(i => (i.toLong, s"pay_$i", s"p${i / 10}"))
      .toDF("id", "payload", "part")
      .createOrReplaceTempView("cat_addc_seed")
    spark.sql("CREATE TABLE gtest.addc.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_addc_seed")
    val dir = s"$rootDir/addc/t"
    val filesV1 = Snapshot.readManifest(dir, 1).files.map(_.path).toSet

    // ADD: metadata-only commit, zero data files touched
    spark.sql("ALTER TABLE gtest.addc.t ADD COLUMN lang STRING")
    assert(Snapshot.currentVersion(dir) == 2 &&
      Snapshot.history(dir).last._2 == "add_column(lang:string)")
    assert(Snapshot.readManifest(dir, 2).files.map(_.path).toSet == filesV1,
      "an ADD must not rewrite a single data file")
    // pre-evolution rows read the new column as NULL; old versions
    // render without it
    assert(spark.sql("SELECT lang FROM gtest.addc.t").collect()
      .forall(_.isNullAt(0)))
    assert(!Snapshot.readAt(spark, dir, 1).columns.contains("lang"))

    // a merge backfills the declared column
    Snapshot.merge(spark, dir,
      upserts = Seq((3L, "pay_3", "p0", "en")).toDF("id", "payload", "part", "lang"),
      deleteKeys = spark.range(0, 0).selectExpr("id"))
    val langs = spark.sql("SELECT id, lang FROM gtest.addc.t")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(langs(3L).contains("en") && langs(4L).isEmpty && langs.size == 20)

    // DROP then re-ADD the same name: fresh physical name — the
    // retired bytes must read as NULL, never resurrect
    spark.sql("ALTER TABLE gtest.addc.t DROP COLUMN lang")
    spark.sql("ALTER TABLE gtest.addc.t ADD COLUMN lang STRING")
    assert(spark.sql("SELECT lang FROM gtest.addc.t").collect()
      .forall(_.isNullAt(0)),
      "a re-added name must map to a fresh physical column")
    val m = Snapshot.readManifest(dir, Snapshot.currentVersion(dir))
    assert(m.columnMap.get("lang").exists(_ != "lang"),
      s"expected a remapped physical name, got ${m.columnMap}")
  }

  test("invariant lifecycle via TBLPROPERTIES: CHECK constraints, guards and expectations set/unset as versioned metadata commits") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.inv")
    seedFrame.createOrReplaceTempView("inv_seed")
    spark.sql("DROP TABLE IF EXISTS gtest.inv.docs")
    spark.sql("CREATE TABLE gtest.inv.docs USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM inv_seed")
    val dir = s"$rootDir/inv/docs"

    // ---- add a CHECK the data satisfies: a metadata commit; FUTURE
    // deliveries gate on it exactly like a create-declared constraint
    spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES " +
      "('check.id_small' = 'id < 1000')")
    assert(Snapshot.history(dir).last._2 == "add_check(id_small)")
    intercept[Exception] {
      spark.sql("INSERT INTO gtest.inv.docs VALUES (5000, 'big', 'p0')")
    }
    assert(!rowsOf(Snapshot.readLatest(spark, dir)).exists(_._1 == 5000L))
    // DESCRIBE-visible
    assert(spark.sql("SHOW TBLPROPERTIES gtest.inv.docs").collect()
      .exists(r => r.getString(0) == "check.id_small"))

    // ---- a CHECK existing rows violate REFUSES with the version untouched
    val v0 = Snapshot.currentVersion(dir)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES " +
        "('check.impossible' = 'id < 10')")
    }
    assert(Snapshot.currentVersion(dir) == v0)

    // ---- UNSET drops the constraint; the insert now lands
    spark.sql("ALTER TABLE gtest.inv.docs UNSET TBLPROPERTIES ('check.id_small')")
    spark.sql("INSERT INTO gtest.inv.docs VALUES (5000, 'big', 'p0')")
    assert(rowsOf(Snapshot.readLatest(spark, dir)).exists(_._1 == 5000L))

    // ---- guards: set min_rows, truncation refuses; drop, it lands
    spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES " +
      "('guard.min_rows' = '10')")
    intercept[Exception] { spark.sql("TRUNCATE TABLE gtest.inv.docs") }
    assert(Snapshot.readLatest(spark, dir).count() == 41L)
    // a floor the CURRENT state violates refuses at publish
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES " +
        "('guard.min_rows' = '1000000')")
    }
    spark.sql("ALTER TABLE gtest.inv.docs UNSET TBLPROPERTIES ('guard.min_rows')")
    spark.sql("TRUNCATE TABLE gtest.inv.docs")
    assert(Snapshot.readLatest(spark, dir).count() == 0L)

    // ---- expectations: the delivery gate, replaced as one property
    spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES " +
      "('expects' = 'row_count:2-1000000;unique:id')")
    intercept[Exception] { // one-row delivery violates the floor
      spark.sql("INSERT INTO gtest.inv.docs VALUES (1, 'a', 'p0')")
    }
    spark.sql("INSERT INTO gtest.inv.docs VALUES (1, 'a', 'p0'), (2, 'b', 'p0')")
    assert(Snapshot.readLatest(spark, dir).count() == 2L)
    spark.sql("ALTER TABLE gtest.inv.docs UNSET TBLPROPERTIES ('expects')")
    spark.sql("INSERT INTO gtest.inv.docs VALUES (3, 'c', 'p0')")
    assert(Snapshot.readLatest(spark, dir).count() == 3L)

    // ---- unknown property shapes refuse; Scala/CLI faces agree
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.inv.docs SET TBLPROPERTIES ('foo' = 'bar')")
    }

    // ---- CREATE honors the same properties (a SHOW TBLPROPERTIES /
    // re-CREATE round-trip never silently drops an invariant)
    spark.sql("DROP TABLE IF EXISTS gtest.inv.docs2")
    spark.sql("CREATE TABLE gtest.inv.docs2 USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part'," +
      "'check.id_pos'='id >= 0','guard.max_shrink_pct'='50'," +
      "'expects'='unique:id') AS SELECT * FROM inv_seed")
    val dir2 = s"$rootDir/inv/docs2"
    val m2 = Snapshot.readManifest(dir2, 1)
    assert(m2.constraints == Map("id_pos" -> "id >= 0") &&
      m2.guards == Map("max_shrink_pct" -> "50") &&
      m2.expects == Seq("unique:id"))
    intercept[Exception] { // the create-declared CHECK gates deliveries
      spark.sql("INSERT INTO gtest.inv.docs2 VALUES (-1, 'neg', 'p0')")
    }
    val (out, code) = SnapshotTool.run(spark,
      Seq("set-guard", dir, "max_shrink_pct", "50"))
    assert(code == 0 && out.head.contains("max_shrink_pct=50"))
    assert(Snapshot.readManifest(dir, Snapshot.currentVersion(dir))
      .guards == Map("max_shrink_pct" -> "50"))
  }

  test("multi-change ALTER TABLE pre-validates as a whole: a late refusal leaves the table untouched") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.multi")
    (0 until 10).map(i => (i.toLong, s"pay_$i", s"p${i % 2}"))
      .toDF("id", "payload", "part")
      .createOrReplaceTempView("cat_multi_seed")
    spark.sql("CREATE TABLE gtest.multi.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_multi_seed")
    val dir = s"$rootDir/multi/t"
    val cat = spark.sessionState.catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("multi"), "t")
    import org.apache.spark.sql.connector.catalog.TableChange
    // first change is valid alone, second refuses (contract column):
    // the statement must apply NEITHER
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.renameColumn(Array("payload"), "body"),
        TableChange.deleteColumn(Array("part"), false))
    }
    assert(Snapshot.currentVersion(dir) == 1,
      "a refused multi-change statement must not half-apply")
    assert(spark.table("gtest.multi.t").columns.toSet ==
      Set("id", "payload", "part"))
    // the same two changes with a valid second apply both as ONE
    // commit — the statement is atomic even against concurrent
    // commits, and the op string records every change
    cat.alterTable(ident,
      TableChange.renameColumn(Array("payload"), "body"),
      TableChange.addColumn(Array("lang"), org.apache.spark.sql.types.StringType))
    assert(Snapshot.currentVersion(dir) == 2,
      "a multi-change ALTER statement is one commit")
    val op = Snapshot.history(dir).last._2
    assert(op.contains("rename_column(payload->body)") &&
      op.contains("add_column(lang:string)"), s"op must record every change: $op")
    assert(spark.table("gtest.multi.t").columns.toSet ==
      Set("id", "body", "part", "lang"))
  }

  test("history metadata table by NAME: graft.ns.t.history ≡ graft_snapshot_history(path)") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.hist")
    seedFrame.createOrReplaceTempView("cat_hist_seed")
    spark.sql("CREATE TABLE gtest.hist.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_hist_seed")
    spark.sql("UPDATE gtest.hist.t SET payload = 'u' WHERE id BETWEEN 3 AND 5")
    val dir = s"$rootDir/hist/t"
    Snapshot.tag(dir, "cut", 1)
    graft.functions.GraftTableFunctions.register(spark)
    val byName = spark.sql("SELECT version, op, parent, n_rows, tags " +
      "FROM gtest.hist.t.history ORDER BY version").collect().toSeq
    val byPath = spark.sql("SELECT version, op, parent, n_rows, tags " +
      s"FROM graft_snapshot_history('$dir') ORDER BY version").collect().toSeq
    assert(byName == byPath && byName.size == 2,
      s"name and path history must agree, got $byName vs $byPath")
    assert(byName.map(_.getString(1)) == Seq("create", "update"))
    // a running session sees new commits (the frame rebuilds per scan)
    spark.sql("DELETE FROM gtest.hist.t WHERE id = 7")
    assert(spark.table("gtest.hist.t.history").count() == 3)
    // no such metadata view / no such parent still error clearly
    intercept[Exception] { spark.table("gtest.hist.t.nope").collect() }
    intercept[Exception] { spark.table("gtest.hist.absent.history").collect() }
  }

  test("files and tags metadata tables: the manifest inventory by NAME") {
    val _ = rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.meta")
    seedFrame.createOrReplaceTempView("cat_meta_seed")
    spark.sql("CREATE TABLE gtest.meta.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_meta_seed")
    val dir = s"$rootDir/meta/t"
    val m = Snapshot.readManifest(dir, 1)
    val files = spark.table("gtest.meta.t.files").collect()
    assert(files.length == m.files.size)
    val byPath = files.map(r => r.getString(1) ->
      (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    m.partitions.foreach { case (pv, fs) => fs.foreach { f =>
      assert(byPath(f.path) == ((pv, f.rows, f.rows, 0L, f.bytes)),
        s"files row mismatch for ${f.path}")
    }}
    // bytes answer the storage question without touching storage
    assert(spark.sql("SELECT sum(bytes) FROM gtest.meta.t.files")
      .head().getLong(0) == m.files.map(_.bytes).sum)
    // a MoR delete surfaces as dv_rows > 0 / logical_rows < rows
    Snapshot.deleteWhereMor(spark, dir, Seq(("id", 3L, 6L)))
    val masked = spark.sql("SELECT sum(dv_rows), sum(rows) - sum(logical_rows) " +
      "FROM gtest.meta.t.files").head()
    assert(masked.getLong(0) == 4L && masked.getLong(1) == 4L)
    // tags table: named refs with their pinned instants
    Snapshot.tag(dir, "cut-a", 1)
    Snapshot.tag(dir, "cut-b", 2)
    val tags = spark.table("gtest.meta.t.tags").collect()
      .map(r => (r.getString(0), r.getInt(1), r.isNullAt(2))).toSeq
    assert(tags == Seq(("cut-a", 1, false), ("cut-b", 2, false)))
    // partitions rollup ≡ files grouped; dv debt surfaces per partition
    val parts = spark.table("gtest.meta.t.partitions").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(4))).toMap
    val m2 = Snapshot.readManifest(dir, 2)
    m2.partitions.foreach { case (pv, fs) =>
      val dv = fs.map(_.dv.map(_.rows).getOrElse(0L)).sum
      assert(parts(pv) == ((fs.size, fs.map(_.rows).sum, dv)),
        s"partitions row mismatch for $pv")
    }
    assert(parts.values.map(_._3).sum == 4L, "MoR debt must surface")
    // the table contract is DESCRIBE-visible (key/partition/version)
    val props = spark.sql("SHOW TBLPROPERTIES gtest.meta.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("key") == "id" && props("partitionCol") == "part" &&
      props("version") == "2")
    // version-addressed inventory views: v1 predates the MoR delete
    assert(spark.sql("SELECT sum(dv_rows) FROM gtest.meta.t.files " +
      "VERSION AS OF 1").head().getLong(0) == 0L)
    assert(spark.sql("SELECT sum(dv_rows) FROM gtest.meta.t.partitions " +
      "VERSION AS OF 2").head().getLong(0) == 4L)
    // history/tags are not version-addressable (refs, not state)
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.meta.t.history VERSION AS OF 1").collect()
    }
  }

  test("catalog over a scheme-qualified root: the whole name surface rides the Hadoop store") {
    val localRoot = Files.createTempDirectory("graft_cat_uri").toString
    spark.conf.set("spark.sql.catalog.gturi", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gturi.root", s"file://$localRoot")
    spark.sql("CREATE NAMESPACE gturi.ns")
    seedFrame.createOrReplaceTempView("cat_uri_seed")
    spark.sql("CREATE TABLE gturi.ns.t USING graft " +
      "TBLPROPERTIES ('key'='id','partitionCol'='part') " +
      "AS SELECT * FROM cat_uri_seed")
    // the commit log landed through the URI (and is locally visible)
    assert(Files.isDirectory(Paths.get(localRoot, "ns", "t", "_log")))
    assert(rowsOf(spark.table("gturi.ns.t")) == rowsOf(seedFrame))
    // DML + time travel + metadata tables by name over the URI root
    spark.sql("UPDATE gturi.ns.t SET payload = 'u' WHERE id BETWEEN 0 AND 4")
    assert(spark.sql("SELECT payload FROM gturi.ns.t WHERE id = 2")
      .as[String].head() == "u")
    assert(spark.sql("SELECT payload FROM gturi.ns.t VERSION AS OF 1 " +
      "WHERE id = 2").as[String].head() == "pay_2")
    assert(spark.table("gturi.ns.t.history").count() == 2)
    assert(spark.table("gturi.ns.t.files").count() ==
      Snapshot.readManifest(s"file://$localRoot/ns/t", 2).files.size)
    assert(spark.sql("SHOW TABLES IN gturi.ns").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE gturi.ns.t")
    spark.sql("DROP NAMESPACE gturi.ns")
    assert(!Files.exists(Paths.get(localRoot, "ns")))
  }

  test("parseInstantMillis: epoch, UTC local, zone-qualified ISO; clear error otherwise") {
    assert(Snapshot.parseInstantMillis("1700000000123") == 1700000000123L)
    val utc = Snapshot.parseInstantMillis("2026-08-15 06:00:00")
    assert(utc == java.time.LocalDateTime.parse("2026-08-15T06:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    // zone-qualified forms are honored, not rejected: Z == the UTC
    // local form; +02:00 is two hours EARLIER as an instant
    assert(Snapshot.parseInstantMillis("2026-08-15T06:00:00Z") == utc)
    assert(Snapshot.parseInstantMillis("2026-08-15 06:00:00+02:00") ==
      utc - 2 * 3600 * 1000L)
    val e = intercept[IllegalArgumentException] {
      Snapshot.parseInstantMillis("yesterday-ish")
    }
    assert(e.getMessage.contains("epoch millis") &&
      e.getMessage.contains("ISO-8601"))
  }
}
