package graft

import graft.functions.GraftTableFunctions
import graft.operators.Snapshot
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SQL table-valued functions over snapshot tables: time travel, tag
  * reads and the change feed as plain `spark.sql`. */
class SqlTvfSpec extends SparkSpecBase {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_tvf_$tag"
    val root = Paths.get(p)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    p
  }

  test("graft_snapshot: tip, version, tag; joinable inside a larger query") {
    GraftTableFunctions.register(spark)
    val t = fresh("read")
    Snapshot.create(spark, t,
      Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
        .toDF("id", "v", "part"), "id", "part")
    Snapshot.tag(t, "first")
    Snapshot.merge(spark, t,
      Seq((4L, "d", "p2"), (2L, "b2", "p1")).toDF("id", "v", "part"),
      Seq(1L).toDF("id"))

    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$t')")
      .as[Long].collect()(0) === 3L)
    assert(spark.sql(s"SELECT v FROM graft_snapshot('$t', 1) ORDER BY id")
      .as[String].collect().toSeq === Seq("a", "b", "c"))
    assert(spark.sql(s"SELECT v FROM graft_snapshot('$t', 'first') WHERE id = 2")
      .as[String].collect().toSeq === Seq("b"))
    // the TVF is a plain relation: join it, aggregate it, alias it
    val joined = spark.sql(
      s"""SELECT cur.id, cur.v AS now, old.v AS was
         |FROM graft_snapshot('$t') cur
         |JOIN graft_snapshot('$t', 1) old USING (id)
         |ORDER BY id""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    assert(joined === Seq((2L, "b2", "b"), (3L, "c", "c")))
  }

  test("graft_snapshot_changes: the commit's removed/added rows, across a rename") {
    GraftTableFunctions.register(spark)
    val t = fresh("chg")
    Snapshot.create(spark, t,
      Seq((1L, "a", "p1"), (2L, "b", "p1")).toDF("id", "v", "part"),
      "id", "part")
    Snapshot.merge(spark, t,
      Seq((3L, "c", "p1")).toDF("id", "v", "part"), Seq(1L).toDF("id"))
    val byChange = spark.sql(
      s"""SELECT _change, sort_array(collect_list(id))
         |FROM graft_snapshot_changes('$t', 2) GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Seq[Long])].collect().toMap
    // p1 was rewritten: removed = the partition's old visible rows,
    // added = its new rows (survivors cancel algebraically)
    assert(byChange("removed") === Seq(1L, 2L))
    assert(byChange("added") === Seq(2L, 3L))

    // a rename is a metadata-only commit: empty change set, and the
    // two sides' differing logical schemas union with null fill
    Snapshot.renameColumn(spark, t, "v", "name")
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot_changes('$t', 3)")
      .as[Long].collect()(0) === 0L)
    // the tip TVF serves the renamed logical view over the old bytes
    assert(spark.sql(s"SELECT name FROM graft_snapshot('$t') WHERE id = 3")
      .as[String].collect().toSeq === Seq("c"))
  }

  test("graft_snapshot_history: versions, ops, logical rows, tags; changes by tag") {
    GraftTableFunctions.register(spark)
    val t = fresh("hist")
    Snapshot.create(spark, t,
      Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
        .toDF("id", "v", "part"), "id", "part")
    Snapshot.merge(spark, t,
      Seq((4L, "d", "p2")).toDF("id", "v", "part"), Seq(1L).toDF("id"))
    Snapshot.tag(t, "rev2", 2)
    Snapshot.deleteWhereMor(spark, t, Seq(("id", 4, 4)))

    val hist = spark.sql(
      s"""SELECT version, op, parent, n_rows, array_join(tags, ',')
         |FROM graft_snapshot_history('$t') ORDER BY version""".stripMargin)
      .as[(Int, String, Int, Long, String)].collect().toSeq
    // n_rows is LOGICAL: the MoR delete shrinks v3 although no data
    // file changed; tags land on their pinned version
    assert(hist === Seq(
      (1, "create", 0, 3L, ""),
      (2, "merge", 1, 3L, "rev2"),
      (3, "delete-mor", 2, 2L, "")))

    // the history TVF is a plain relation — aggregate over it
    assert(spark.sql(
      s"SELECT max(version) FROM graft_snapshot_history('$t') WHERE op = 'merge'")
      .as[Int].collect()(0) === 2)

    // committed_at correlates versions to wall-clock from SQL alone:
    // a real instant per version, non-decreasing along the log, and
    // each version resolves back to itself through the as-of axis
    val ats = spark.sql(s"SELECT version, committed_at " +
        s"FROM graft_snapshot_history('$t') ORDER BY version")
      .as[(Int, java.sql.Timestamp)].collect().toSeq
    assert(ats.map(_._1) === Seq(1, 2, 3) && ats.forall(_._2 != null))
    assert(ats.sliding(2).forall {
      case Seq((_, a), (_, b)) => !b.before(a)
      case _ => true
    }, "commit instants must be non-decreasing along the log")
    ats.foreach { case (v, at) =>
      assert(Snapshot.versionAtTime(t, at.getTime) >= v,
        s"as-of its own instant must see v$v or later")
    }

    // change feed addressed by TAG ≡ by version number
    val byTag = spark.sql(
      s"""SELECT _change, sort_array(collect_list(id))
         |FROM graft_snapshot_changes('$t', 'rev2') GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Seq[Long])].collect().toSeq
    val byV = spark.sql(
      s"""SELECT _change, sort_array(collect_list(id))
         |FROM graft_snapshot_changes('$t', 2) GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Seq[Long])].collect().toSeq
    assert(byTag === byV && byTag.nonEmpty)
    // an unknown tag errors with the available tags named
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_snapshot_changes('$t', 'nope')").collect()
    }
    assert(e.getMessage.contains("no tag"), s"got: ${e.getMessage}")
  }

  test("graft_snapshot_files / graft_snapshot_partitions: the inventory by path ≡ the manifest") {
    GraftTableFunctions.register(spark)
    val t = fresh("files")
    Snapshot.create(spark, t,
      (0 until 20).map(i => (i.toLong, s"v$i", s"p${i % 4}"))
        .toDF("id", "v", "part"), "id", "part")
    Snapshot.deleteWhereMor(spark, t, Seq(("id", 0, 2)))
    val m = Snapshot.readManifest(t, 2)
    val files = spark.sql(s"SELECT partition, path, rows, logical_rows, " +
        s"dv_rows, bytes FROM graft_snapshot_files('$t')")
      .collect().map(r => r.getString(1) ->
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(files.size == m.files.size)
    m.partitions.foreach { case (pv, fs) => fs.foreach { f =>
      val dv = f.dv.map(_.rows).getOrElse(0L)
      assert(files(f.path) == ((pv, f.rows, f.rows - dv, dv, f.bytes)))
    }}
    // the rollup is the files frame grouped — provable in SQL itself
    val viaGroup = spark.sql(s"SELECT partition, count(*), sum(rows), " +
        s"sum(dv_rows) FROM graft_snapshot_files('$t') GROUP BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rollup = spark.sql(s"SELECT partition, CAST(n_files AS BIGINT), " +
        s"rows, dv_rows FROM graft_snapshot_partitions('$t')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rollup == viaGroup && rollup.nonEmpty)
    // total MoR debt: the 3 masked rows surface
    assert(spark.sql(s"SELECT sum(dv_rows) FROM graft_snapshot_partitions('$t')")
      .head().getLong(0) == 3L)
    // version-addressed inventory: v1 predates the MoR delete, and a
    // tag resolves the same way
    assert(spark.sql(s"SELECT sum(dv_rows) FROM graft_snapshot_files('$t', 1)")
      .head().getLong(0) == 0L)
    Snapshot.tag(t, "pre-mor", 1)
    assert(spark.sql(s"SELECT sum(dv_rows) " +
      s"FROM graft_snapshot_partitions('$t', 'pre-mor')").head().getLong(0) == 0L)
  }

  test("TVF argument contract: literals only, sane arity errors") {
    GraftTableFunctions.register(spark)
    val t = fresh("err")
    Snapshot.create(spark, t,
      Seq((1L, "a", "p1")).toDF("id", "v", "part"), "id", "part")
    // non-literal path must be rejected at analysis, not mis-planned
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_snapshot(concat('$t', v))").collect()
    }
    assert(e1.getMessage != null)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_snapshot()").collect()
    }
    assert(e2.getMessage != null)
    // a non-integer, non-string second argument gets a CLEAR error,
    // not a fall-through to a bogus tag lookup
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_snapshot('$t', 2.5)").collect()
    }
    assert(e3.getMessage.contains("integer version or a string tag"),
      s"got: ${e3.getMessage}")
  }
}
