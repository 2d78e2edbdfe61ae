package graft

import graft.operators.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** NON-ADDITIVE schema evolution: rename / drop / widen as
  * metadata-only commits over the column-mapping layer (physical
  * names stable forever; logical names live in the manifest). */
class SnapshotEvolutionSpec extends SparkSpecBase {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_snapevo_$tag"
    val root = Paths.get(p)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    p
  }

  private def seed: DataFrame = Seq(
    (1L, "alpha", 10, "p1"), (2L, "bravo", 20, "p1"),
    (3L, "charlie", 30, "p2"), (4L, "delta", 40, "p2"))
    .toDF("id", "note", "score", "part")

  private def dataFileCount(t: String): Int =
    Snapshot.readManifest(t, Snapshot.currentVersion(t)).files.size

  test("rename: metadata-only commit; old data under the new name; merges keep working; time travel keeps the old name") {
    val t = fresh("rename")
    Snapshot.create(spark, t, seed, "id", "part")
    val filesBefore = Snapshot.readManifest(t, 1).files.map(_.path).toSet

    val st = Snapshot.renameColumn(spark, t, "note", "comment")
    assert(st.version === 2 && st.filesWritten === 0)
    // zero data files touched — the file set is IDENTICAL
    assert(Snapshot.readManifest(t, 2).files.map(_.path).toSet === filesBefore)
    assert(Snapshot.readManifest(t, 2).columnMap === Map("comment" -> "note"))

    // old bytes visible under the new logical name
    val now = Snapshot.readLatest(spark, t)
    assert(now.columns.toSeq === Seq("id", "comment", "score", "part"))
    assert(now.select("id", "comment").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")))
    // time travel renders v1 under ITS schema
    assert(Snapshot.readAt(spark, t, 1).columns.contains("note"))

    // a merge AFTER the rename speaks the new logical name; the new
    // file still stores the stable physical name so mixed-vintage
    // reads stay one schema
    Snapshot.merge(spark, t,
      Seq((5L, "echo", 50, "p1"), (2L, "bravo2", 21, "p1"))
        .toDF("id", "comment", "score", "part"),
      Seq(4L).toDF("id"))
    val m3 = Snapshot.readManifest(t, 3)
    assert(m3.columnMap === Map("comment" -> "note"))
    val merged = Snapshot.readLatest(spark, t)
    assert(merged.select("id", "comment").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "bravo2"), (3L, "charlie"), (5L, "echo")))
    // the freshest data file physically stores 'note', not 'comment'
    val newest = m3.files.map(_.path).filterNot(filesBefore).head
    val raw = spark.read.parquet(s"$t/$newest")
    assert(raw.columns.contains("note") && !raw.columns.contains("comment"))

    // MoR delete + compact still work over the mapping; fsck clean
    Snapshot.deleteMorKeys(spark, t, Seq(3L).toDF("id"))
    assert(Snapshot.readLatest(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 5L))
    Snapshot.compact(spark, t, maxFilesPerPartition = 1)
    assert(Snapshot.readLatest(spark, t)
      .select("id", "comment").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "bravo2"), (5L, "echo")))
    assert(Snapshot.fsck(spark, t).isEmpty)

    // rollback across the rename restores the old logical name
    Snapshot.rollback(spark, t, 1)
    assert(Snapshot.readLatest(spark, t).columns.contains("note"))
  }

  test("drop: column vanishes logically, bytes stay until rewrite; re-add never resurrects dropped data") {
    val t = fresh("drop")
    Snapshot.create(spark, t, seed, "id", "part")
    val st = Snapshot.dropColumn(spark, t, "note")
    assert(st.filesWritten === 0)
    val now = Snapshot.readLatest(spark, t)
    assert(now.columns.toSeq === Seq("id", "score", "part"))
    assert(Snapshot.readManifest(t, 2).retiredCols === Seq("note"))
    // physical bytes still in the v1 files (lazy deletion)
    val anyFile = Snapshot.readManifest(t, 2).files.head.path
    assert(spark.read.parquet(s"$t/$anyFile").columns.contains("note"))
    // time travel to v1 still shows the column
    assert(Snapshot.readAt(spark, t, 1).columns.contains("note"))

    // RE-ADD a column with the same logical name (additive merge):
    // it must map to a FRESH physical name — old rows read as null,
    // never as the dropped bytes
    Snapshot.merge(spark, t,
      Seq((5L, 50, "p1", "fresh")).toDF("id", "score", "part", "note"),
      spark.emptyDataset[Long].toDF("id"))
    val m3 = Snapshot.readManifest(t, 3)
    assert(m3.columnMap.get("note").exists(_ != "note"),
      s"re-added 'note' must take a fresh physical name, got ${m3.columnMap}")
    val readd = Snapshot.readLatest(spark, t)
      .select("id", "note").as[(Long, Option[String])].collect().toMap
    assert(readd(5L) === Some("fresh"))
    assert(readd(1L) === None && readd(2L) === None,
      "dropped bytes must NOT resurrect as the re-added column")
    assert(Snapshot.fsck(spark, t).isEmpty)

    // compact is where lazy deletion lands: rewritten files carry the
    // CURRENT physical schema, so the retired column's bytes are gone
    Snapshot.compact(spark, t, maxFilesPerPartition = 1)
    val mC = Snapshot.readManifest(t, Snapshot.currentVersion(t))
    mC.files.foreach { f =>
      val cols = spark.read.parquet(s"$t/${f.path}").columns.toSet
      assert(!cols.contains("note"),
        s"compact must purge the retired physical column from ${f.path}: $cols")
    }
    assert(Snapshot.readLatest(spark, t)
      .select("id", "note").as[(Long, Option[String])].collect().toMap === readd,
    "purge must not change the logical view")
  }

  test("widen int->bigint: metadata-only; narrow files up-convert on read; post-widen merges write wide") {
    val t = fresh("widen")
    Snapshot.create(spark, t, seed, "id", "part")
    val st = Snapshot.widenColumn(spark, t, "score", "bigint")
    assert(st.filesWritten === 0)
    val now = Snapshot.readLatest(spark, t)
    assert(now.schema("score").dataType.simpleString === "bigint")
    assert(now.select("id", "score").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // merge with genuinely long values lands beside the int files
    Snapshot.merge(spark, t,
      Seq((5L, "echo", 5000000000L, "p1")).toDF("id", "note", "score", "part"),
      spark.emptyDataset[Long].toDF("id"))
    assert(Snapshot.readLatest(spark, t)
      .select("id", "score").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 5000000000L)))
    assert(Snapshot.fsck(spark, t).isEmpty)
  }

  test("evolution barring matches whole identifiers, not substrings") {
    val t = fresh("barsub")
    // 'n' and 'count' are substrings of check text ('n_chars > 0',
    // 'row_count:...') but NOT referenced columns — they must evolve;
    // 'score' is genuinely named by unique: — it must be barred
    val df = Seq((1L, "a", 10, 5, 3, "p1")).toDF(
      "id", "note", "score", "n", "count", "part")
    // the constraint text contains 'n' and 'count' only INSIDE longer
    // identifiers ('note', 'discount' literal); neither column is a
    // real reference
    Snapshot.create(spark, t, df, "id", "part",
      constraints = Map("cp" -> "note IS NOT NULL AND 'discount' = 'discount'"),
      expects = Seq("row_count:1-100000", "unique:score"))
    intercept[IllegalArgumentException] { // named by unique:score
      Snapshot.renameColumn(spark, t, "score", "score2") }
    Snapshot.renameColumn(spark, t, "count", "cnt")  // substring only: allowed
    Snapshot.renameColumn(spark, t, "n", "n2")       // substring only: allowed
    assert(Snapshot.readLatest(spark, t).columns.toSeq ===
      Seq("id", "note", "score", "n2", "cnt", "part"))
  }

  test("re-add collides with a literal __c column: generator bumps past it") {
    val t = fresh("collide")
    // the table legitimately contains a column whose NAME matches the
    // generated-physical pattern for the version the re-add lands at
    val df = Seq((1L, "a", "x", "p1"), (2L, "b", "y", "p1"))
      .toDF("id", "note", "note__c3", "part")
    Snapshot.create(spark, t, df, "id", "part")
    Snapshot.dropColumn(spark, t, "note")                 // v2, retires 'note'
    Snapshot.merge(spark, t,                              // v3 re-adds 'note'
      Seq((3L, "z", "p1", "fresh")).toDF("id", "note__c3", "part", "note"),
      spark.emptyDataset[Long].toDF("id"))
    val m = Snapshot.readManifest(t, 3)
    val phys = m.columnMap("note")
    assert(phys != "note" && phys != "note__c3",
      s"generated physical name must dodge BOTH the retired and the literal column: $phys")
    val rows = Snapshot.readLatest(spark, t)
      .select("id", "note__c3", "note").as[(Long, String, Option[String])]
      .collect().map { case (k, v, n) => k -> (v, n) }.toMap
    assert(rows(1L) === ("x", None) && rows(3L) === ("z", Some("fresh")),
      "the literal __c column's bytes must never interleave with the re-add")
  }

  test("evolution guards: contract columns, collisions, unsafe changes all rejected") {
    val t = fresh("guards")
    Snapshot.create(spark, t, seed, "id", "part", statsCols = Seq("score"),
      constraints = Map("nn" -> "note IS NOT NULL"))
    intercept[IllegalArgumentException] { // merge key
      Snapshot.renameColumn(spark, t, "id", "id2") }
    intercept[IllegalArgumentException] { // partition column
      Snapshot.dropColumn(spark, t, "part") }
    intercept[IllegalArgumentException] { // stats column
      Snapshot.widenColumn(spark, t, "score", "bigint") }
    intercept[IllegalArgumentException] { // constraint-referenced
      Snapshot.dropColumn(spark, t, "note") }
    intercept[IllegalArgumentException] { // target name taken
      Snapshot.renameColumn(spark, t, "note", "score") }
    intercept[IllegalArgumentException] { // unknown column
      Snapshot.renameColumn(spark, t, "nope", "x") }
    intercept[IllegalArgumentException] { // narrowing is not widening
      Snapshot.widenColumn(spark, t, "note", "int") }
    // nothing committed by any rejected op
    assert(Snapshot.currentVersion(t) === 1)
  }

  test("SnapshotTool verbs: rename-col / drop-col / widen-col + describe shows the map") {
    val t = fresh("cli")
    Snapshot.create(spark, t, seed, "id", "part")
    val (l1, c1) = SnapshotTool.run(spark, Seq("rename-col", t, "note", "comment"))
    assert(c1 === 0 && l1.head.contains("v2"))
    val (l2, c2) = SnapshotTool.run(spark, Seq("widen-col", t, "score", "bigint"))
    assert(c2 === 0 && l2.head.contains("v3"))
    val (l3, c3) = SnapshotTool.run(spark, Seq("drop-col", t, "comment"))
    assert(c3 === 0 && l3.head.contains("v4"))
    val (desc, _) = SnapshotTool.run(spark, Seq("describe", t))
    val cmLine = desc.find(_.startsWith("column map")).get
    assert(cmLine.contains("retired: note"), cmLine)
    assert(Snapshot.readLatest(spark, t).columns.toSeq === Seq("id", "score", "part"))
  }

  test("rename + drop survive the optimistic and WAP paths") {
    val t = fresh("opt")
    Snapshot.create(spark, t, seed, "id", "part")
    Snapshot.renameColumn(spark, t, "note", "comment")
    // optimistic merge under the mapping
    Snapshot.mergeOptimistic(spark, t,
      Seq((6L, "golf", 60, "p2")).toDF("id", "comment", "score", "part"),
      spark.emptyDataset[Long].toDF("id"))
    assert(Snapshot.readLatest(spark, t)
      .select("id", "comment").as[(Long, String)].collect().toSet
      .contains((6L, "golf")))
    // WAP audit reads the post-state under LOGICAL names
    Snapshot.wapMerge(spark, t,
      Seq((7L, "hotel", 70, "p1")).toDF("id", "comment", "score", "part"),
      spark.emptyDataset[Long].toDF("id"),
      audit = Seq("row_count:5-100"))
    assert(Snapshot.readLatest(spark, t).count() === 6)
    assert(Snapshot.fsck(spark, t).isEmpty)
  }
}
