package graft.sources

import graft.operators.Snapshot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL MAINTENANCE PROCEDURES — the table format's ops verbs
 * (compact / vacuum / fsck / relayout / tag / untag / rollback) for
 * pure-SQL users, through Spark 4's native `ProcedureCatalog` +
 * `CALL` statement (the Iceberg `CALL catalog.system.…` shape):
 *
 * {{{
 *   CALL graft.system.compact('corpus.docs')
 *   CALL graft.system.compact('corpus.docs', max_files_per_partition => 2)
 *   CALL graft.system.vacuum('corpus.docs', retain_last => 3)
 *   CALL graft.system.fsck('corpus.docs')          -- findings as rows
 *   CALL graft.system.relayout('corpus.docs', 8, zorder_keys => 'a,b')
 *   CALL graft.system.tag('corpus.docs', 'train-cut-1')
 *   CALL graft.system.untag('corpus.docs', 'train-cut-1')
 *   CALL graft.system.rollback('corpus.docs', 3)
 * }}}
 *
 * Each CALL runs the SAME Scala verb the programmatic API and
 * [[graft.SnapshotTool]] run — one implementation, three faces — so
 * a SQL compact is commit-for-commit identical to the Scala one
 * (spec-proven), tag pins protect vacuum identically, and every verb
 * holds the commit lock through the table's [[graft.operators.LogStore]].
 * Results come back as result-set rows (the new version, files
 * reclaimed, fsck findings), so CALL composes with the SQL tooling
 * that scheduled the maintenance. Table names resolve through the
 * OWNING catalog's root (`ns.t` under `spark.sql.catalog.<cat>.root`);
 * unknown tables refuse with the table name, before any lock claim.
 */
private[sources] final class GraftProcedures(
    catalogName: String, resolveTable: String => String) {

  private def in(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()
  private def inD(n: String, dt: DataType, default: String) =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private def u(s: String) = UTF8String.fromString(s)

  /** One maintenance verb: parameters, result schema, body. The body
    * gets the RESOLVED table dir (existence already checked) plus the
    * coerced argument row. */
  private final class Proc(
      val pname: String, desc: String,
      params: Array[ProcedureParameter], out: StructType,
      body: (SparkSession, String, InternalRow) => Seq[InternalRow])
    extends UnboundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = pname
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // side-effecting
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = SparkSession.active
          val table = input.getUTF8String(0).toString
          val dir = resolveTable(table)
          val resultRows = body(spark, dir, input).toArray
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = resultRows
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
  }

  private def commitRow(st: Snapshot.CommitStats): Seq[InternalRow] = Seq(
    InternalRow(st.version, st.rewrittenPartitions.size, st.filesWritten))
  private def vacuumRow(vs: Snapshot.VacuumStats): Seq[InternalRow] = Seq(
    InternalRow(vs.filesDeleted, vs.manifestsDeleted, vs.bytesFreed))
  private val vacuumSchema = StructType(Seq(
    StructField("files_deleted", IntegerType, nullable = false),
    StructField("manifests_deleted", IntegerType, nullable = false),
    StructField("bytes_freed", LongType, nullable = false)))
  private val commitSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("rewritten_partitions", IntegerType, nullable = false),
    StructField("files_written", IntegerType, nullable = false)))

  val all: Map[String, UnboundProcedure] = Seq(
    new Proc("compact",
      "rewrite fragmented partitions down to max_files_per_partition " +
        "(materializes deletion vectors); one atomic commit",
      Array(in("table", StringType),
        inD("max_files_per_partition", IntegerType, "4")),
      commitSchema,
      (s, dir, args) => commitRow(Snapshot.compact(s, dir, args.getInt(1)))),

    new Proc("vacuum",
      "delete files referenced by no retained version; retention is " +
        "the UNION of retain_last (count) and retain_hours (age, " +
        "committed_at axis; -1 disables); tag-pinned versions always " +
        "survive",
      Array(in("table", StringType), inD("retain_last", IntegerType, "2"),
        inD("retain_hours", DoubleType, "-1.0")),
      vacuumSchema,
      (s, dir, args) => vacuumRow(
        Snapshot.vacuum(s, dir, args.getInt(1),
          retainHours = args.getDouble(2)))),

    new Proc("expire_snapshots",
      "drop every version committed at or before older_than (epoch " +
        "millis or a UTC timestamp string), reclaiming unreferenced " +
        "files; the current version and tag pins always survive",
      Array(in("table", StringType), in("older_than", StringType)),
      vacuumSchema,
      (s, dir, args) => vacuumRow(Snapshot.expireSnapshots(s, dir,
        Snapshot.parseInstantMillis(args.getUTF8String(1).toString)))),

    new Proc("fsck",
      "audit the log and files; one row per finding (empty = clean)",
      Array(in("table", StringType)),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("problem", StringType, nullable = false))),
      (s, dir, _) => Snapshot.fsck(s, dir)
        .map(i => InternalRow(i.version, u(i.file), u(i.problem)))),

    new Proc("relayout",
      "rewrite the live file set into file_ranges files per partition " +
        "under mode 'range' or 'zorder' (zorder_keys comma-separated)",
      Array(in("table", StringType), in("file_ranges", IntegerType),
        inD("mode", StringType, "'range'"),
        inD("zorder_keys", StringType, "''")),
      commitSchema,
      (s, dir, args) => commitRow(Snapshot.relayout(s, dir, args.getInt(1),
        args.getUTF8String(2).toString,
        args.getUTF8String(3).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))),

    new Proc("rewrite_partitioning",
      "rewrite the table under a NEW partition spec (comma-separated; " +
        "identity columns, days(col), bucket(n,col)) as one commit — " +
        "older versions keep their own spec; keys/layout/invariants " +
        "carry forward",
      Array(in("table", StringType), in("spec", StringType)),
      commitSchema,
      (s, dir, args) => commitRow(Snapshot.repartitionTable(s, dir,
        Snapshot.PartField.splitSpecs(args.getUTF8String(1).toString)))),

    new Proc("tag",
      "pin a version (default: the current one) under a name; " +
        "vacuum retains it until untagged",
      Array(in("table", StringType), in("name", StringType),
        inD("version", IntegerType, "0")),
      StructType(Seq(
        StructField("tag", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      (s, dir, args) => {
        val name = args.getUTF8String(1).toString
        Snapshot.tag(dir, name, args.getInt(2))
        Seq(InternalRow(u(name), Snapshot.tags(dir)(name)))
      }),

    new Proc("untag",
      "release a named pin; the next vacuum may reclaim the version",
      Array(in("table", StringType), in("name", StringType)),
      StructType(Seq(StructField("tag", StringType, nullable = false))),
      (s, dir, args) => {
        val name = args.getUTF8String(1).toString
        Snapshot.untag(dir, name)
        Seq(InternalRow(u(name)))
      }),

    new Proc("rollback",
      "publish a new version whose live file set is to_version's " +
        "(history preserved; an O(manifest) undo)",
      Array(in("table", StringType), in("to_version", IntegerType)),
      StructType(Seq(StructField("version", IntegerType, nullable = false))),
      (s, dir, args) => Seq(InternalRow(
        Snapshot.rollback(s, dir, args.getInt(1)).version)))
  ).map(procedure => procedure.pname -> (procedure: UnboundProcedure)).toMap

  def load(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(Array("system")))
      throw new RuntimeException(
        s"graft catalog '$catalogName': procedures live under the " +
          s"'system' namespace — CALL $catalogName.system.<verb>(...), " +
          s"got ${ident.namespace.mkString(".")}.${ident.name}")
    all.getOrElse(ident.name, throw new RuntimeException(
      s"graft catalog '$catalogName': no procedure '${ident.name}' " +
        s"(available: ${all.keys.toSeq.sorted.mkString(", ")})"))
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      all.keys.toSeq.sorted
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
