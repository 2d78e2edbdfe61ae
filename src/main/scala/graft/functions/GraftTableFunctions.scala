package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * TABLE-VALUED FUNCTIONS over graft snapshot tables, so time travel
 * and the change feed are plain SQL — no DataFrame API required:
 *
 * {{{
 *   GraftTableFunctions.register(spark)
 *   spark.sql("SELECT * FROM graft_snapshot('/data/corpus_v')")       // tip
 *   spark.sql("SELECT * FROM graft_snapshot('/data/corpus_v', 3)")    // as of v3
 *   spark.sql("SELECT * FROM graft_snapshot('/data/corpus_v', 'training-2026-08-14')")
 *   spark.sql("SELECT _change, count(*) FROM graft_snapshot_changes('/data/corpus_v', 4) GROUP BY 1")
 * }}}
 *
 * The builder runs at ANALYSIS time: arguments must be literals (the
 * standard TVF contract), the snapshot manifest resolves driver-side,
 * and the returned plan is the same pruned, deletion-vector-masked,
 * column-mapped read `Snapshot.readAt` produces — Catalyst then
 * optimizes it inside the enclosing query like any other relation.
 * Beside [[GraftFunctions]] (scalar kernels), this is the second half
 * of the SQL surface; `spark.sql.extensions=graft.GraftExtensions`
 * injects both into sessions graft did not build.
 */
object GraftTableFunctions {

  private case class Tf(name: String, usage: String,
                        build: Seq[Expression] => LogicalPlan)

  private def litArg(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
  }

  private def pathArg(e: Expression, fn: String): String = {
    val v = litArg(e, s"$fn: path")
    require(v != null, s"$fn: path must not be NULL")
    String.valueOf(v)
  }

  private def snapshotPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "usage: graft_snapshot(path[, version | tag])")
    val spark = SparkSession.active
    val path = pathArg(args.head, "graft_snapshot")
    val df = args.lift(1).map(litArg(_, "graft_snapshot: version/tag")) match {
      case None => graft.operators.Snapshot.readLatest(spark, path)
      case Some(i: Int) => graft.operators.Snapshot.readAt(spark, path, i)
      case Some(l: Long) => graft.operators.Snapshot.readAt(spark, path, l.toInt)
      case Some(s: org.apache.spark.unsafe.types.UTF8String) =>
        graft.operators.Snapshot.readTag(spark, path, s.toString)
      case Some(other) => throw new IllegalArgumentException(
        "graft_snapshot: second argument must be an integer version or a " +
          s"string tag, got ${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
    df.queryExecution.logical
  }

  private def changesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2, "usage: graft_snapshot_changes(path, version | tag)")
    val spark = SparkSession.active
    val path = pathArg(args.head, "graft_snapshot_changes")
    val v = litArg(args(1), "graft_snapshot_changes: version/tag") match {
      case i: Int => i
      case l: Long => l.toInt
      case s: org.apache.spark.unsafe.types.UTF8String =>
        // a tag names a committed state; its change set is that
        // version's commit — same resolution as graft_snapshot(path, tag)
        val t = graft.operators.Snapshot.tags(path)
        require(t.contains(s.toString),
          s"graft_snapshot_changes: no tag '$s' on $path " +
            s"(tags: ${t.keys.toSeq.sorted.mkString(",")})")
        t(s.toString)
      case other => throw new IllegalArgumentException(
        "graft_snapshot_changes: second argument must be an integer " +
          s"version or a string tag, got ${
            if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
    val (removed, added) = graft.operators.Snapshot.changeSet(spark, path, v)
    import org.apache.spark.sql.functions.lit
    // allowMissingColumns: the two sides read under THEIR versions'
    // schemas, which differ across an (additive or non-additive)
    // evolution commit — absent columns null-fill
    removed.withColumn("_change", lit("removed"))
      .unionByName(added.withColumn("_change", lit("added")),
        allowMissingColumns = true)
      .queryExecution.logical
  }

  /** The history frame both the TVF and the catalog metadata table
    * (`graft.ns.t.history`) serve: manifest metadata only — a
    * driver-side fold over O(versions) JSON files (never data files),
    * materialized as a LocalRelation the enclosing query filters/
    * joins/aggregates like any relation. */
  private[graft] def historyFrame(spark: SparkSession,
                                  path: String): org.apache.spark.sql.DataFrame = {
    val tagsByV = graft.operators.Snapshot.tags(path)
      .groupBy(_._2).map { case (v, m) => v -> m.keys.toSeq.sorted }
    val rows = graft.operators.Snapshot.history(path).map {
      case (v, op, parent, nParts, nFiles, nRows) =>
        // committed_at: the wall-clock instant (UTC) — SQL users
        // correlate versions to run times without the Scala API;
        // pre-field manifests surface NULL, never a fake epoch
        val at = graft.operators.Snapshot.committedAt(path, v)
        (v, op, parent, nParts, nFiles, nRows, tagsByV.getOrElse(v, Nil),
          if (at > 0) Some(new java.sql.Timestamp(at)) else None)
    }
    import spark.implicits._
    rows.toDF("version", "op", "parent", "n_partitions", "n_files",
      "n_rows", "tags", "committed_at")
  }

  private def historyPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "usage: graft_snapshot_history(path)")
    val spark = SparkSession.active
    val path = pathArg(args.head, "graft_snapshot_history")
    historyFrame(spark, path).queryExecution.logical
  }

  // the inventory frames ([[graft.sources.GraftCatalog.filesFrame]]/
  // partitionsFrame) exposed by PATH, for SQL users without a
  // catalog mount — same columns as graft.ns.t.files / .partitions
  private def versionArg(path: String, arg: Expression, fn: String): Int =
    litArg(arg, s"$fn: version/tag") match {
      case i: Int => i
      case l: Long => l.toInt
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val t = graft.operators.Snapshot.tags(path)
        t.getOrElse(s.toString, throw new IllegalArgumentException(
          s"$fn: no tag '$s' on $path " +
            s"(tags: ${t.keys.toSeq.sorted.mkString(",")})"))
      case other => throw new IllegalArgumentException(
        s"$fn: second argument must be an integer version or a string " +
          s"tag, got ${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }

  private def filesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      "usage: graft_snapshot_files(path[, version | tag])")
    val path = pathArg(args.head, "graft_snapshot_files")
    val v = if (args.size == 2)
      versionArg(path, args(1), "graft_snapshot_files") else 0
    graft.sources.GraftCatalog.filesFrame(SparkSession.active, path, v)
      .queryExecution.logical
  }

  private def partitionsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      "usage: graft_snapshot_partitions(path[, version | tag])")
    val path = pathArg(args.head, "graft_snapshot_partitions")
    val v = if (args.size == 2)
      versionArg(path, args(1), "graft_snapshot_partitions") else 0
    graft.sources.GraftCatalog.partitionsFrame(SparkSession.active, path, v)
      .queryExecution.logical
  }

  private val tfs = Seq(
    Tf("graft_snapshot",
      "graft_snapshot(path[, version | tag]) - time-travel read of a " +
        "graft snapshot table (tip when only path is given)",
      snapshotPlan),
    Tf("graft_snapshot_changes",
      "graft_snapshot_changes(path, version | tag) - the commit's " +
        "change set: removed + added rows flagged by _change",
      changesPlan),
    Tf("graft_snapshot_history",
      "graft_snapshot_history(path) - one row per retained version: " +
        "(version, op, parent, n_partitions, n_files, n_rows, tags, " +
        "committed_at)",
      historyPlan),
    Tf("graft_snapshot_files",
      "graft_snapshot_files(path[, version | tag]) - a version's live " +
        "file inventory: (partition, path, rows, logical_rows, dv_rows, bytes)",
      filesPlan),
    Tf("graft_snapshot_partitions",
      "graft_snapshot_partitions(path[, version | tag]) - per-partition " +
        "rollup: (partition, n_files, rows, logical_rows, dv_rows, bytes)",
      partitionsPlan))

  /** Register the TVFs in a live session's table-function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
    tfs.foreach { f =>
      reg.registerFunction(FunctionIdentifier(f.name),
        new ExpressionInfo("graft", f.name, f.usage), f.build)
    }
  }

  /** Inject through `SparkSessionExtensions` (see
    * [[graft.GraftExtensions]]). */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    tfs.foreach { f =>
      ext.injectTableFunction((FunctionIdentifier(f.name),
        new ExpressionInfo("graft", f.name, f.usage), f.build))
    }
}
