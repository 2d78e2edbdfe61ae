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
  }
}
