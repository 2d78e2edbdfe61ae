package graft.sources

import graft.operators.Snapshot

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType,
  LongType, StringType, StructField, StructType}

/**
 * STREAMING CHANGE-FEED READ of a graft snapshot table — the CDC-out
 * one-liner:
 *
 * {{{
 *   spark.readStream.format("graft").load("/data/corpus_v")
 *     .writeStream.option("checkpointLocation", ck)
 *     .foreachBatch { (batch, _) => ... }   // rows + _change + _version
 * }}}
 *
 * Offsets ARE version numbers: the append-only commit log is already
 * a totally-ordered, replayable stream, so the source needs no state
 * of its own — `getOffset` is the tip version, a micro-batch is the
 * union of [[Snapshot.changeSet]] over the versions in
 * `(start, end]`, each row flagged `_change` (added|removed) and
 * stamped `_version`. The checkpoint records plain version numbers,
 * so restart resumes mid-log exactly; work per batch is bounded by
 * the commits' copy-on-write footprint, never the table.
 *
 * Options:
 *  - `startingVersion` (default 0): consume from this version
 *    EXCLUSIVE — 0 replays the whole log (create included, so a
 *    downstream view bootstraps from nothing); `latest` starts at the
 *    tip and emits only future commits.
 *  - `emitLayoutOps` (default false): pure layout commits (`compact`,
 *    `relayout`) have change sets that NET TO ZERO by contract —
 *    emitting them would stream a table-sized no-op (at 100 TB, THE
 *    scale bug), so they are skipped by op unless asked for.
 *  - `maxVersionsPerBatch` (default 0 = unbounded): cap how many
 *    commits one micro-batch unions. Without it, a cold start
 *    (`startingVersion` 0) over a 10k-commit log would plan a single
 *    10k-way union — the bootstrap-over-a-long-log scale bug (Delta's
 *    `maxFilesPerTrigger` shape). With it, `getOffset` advances at
 *    most k versions past the last batch's end, so the bootstrap
 *    proceeds in bounded batches and each checkpoint entry marks real
 *    progress; the final state is identical to the unbounded read.
 *  - `maxRowsPerBatch` (default 0 = unbounded): budget a micro-batch
 *    by the commits' GROSS change-set rows instead of (or alongside)
 *    their count — versions accrue until the NEXT one would blow the
 *    budget (a single oversized commit still ships alone: progress
 *    over purity). Row counts come from the manifests alone
 *    ([[Snapshot.changeRowCount]]); a 1-row-per-commit trickle log
 *    batches hundreds of versions while one table-wide backfill
 *    commit ships by itself.
 *
 * SCHEMA EVOLUTION ACROSS THE STREAM — a deliberate, three-way
 * contract (`onSchemaChange`). The output schema is pinned at stream
 * start (tip manifest + `_change`, `_version`); what happens when the
 * batch range crosses an evolution commit depends on the mode:
 *
 *  - `identity` (default): change-set frames align to the pinned
 *    schema by PHYSICAL column identity (the manifest's column map —
 *    physical names are stable forever), not by logical name. A
 *    RENAME anywhere — history replayed at bootstrap OR mid-stream —
 *    is therefore LOSSLESS: the renamed column's values keep flowing
 *    under the pinned logical name (where Delta name-mode null-fills
 *    or fails). A column the pinned schema has that a version predates
 *    null-fills (it didn't exist yet — the additive contract); a
 *    pre-pin DROPPED column's values are simply gone from the table
 *    and stay out of the stream; history written under a NARROWER
 *    type upcasts (the only widenings the format admits are lossless
 *    int→bigint / float→double). The residue that CANNOT be rendered
 *    faithfully under a stale pinned schema — a column ADDED after
 *    the pin (its values would silently vanish), DROPPED after the
 *    pin (nulls would impersonate deleted data), or WIDENED after the
 *    pin (casting new wide values down is lossy) — FAILS the batch
 *    with [[StreamSchemaChangedException]] naming the version and the
 *    change, BEFORE any row ships. Restarting from the SAME
 *    checkpoint re-pins the new tip schema and the boundary batch
 *    replays losslessly under it (adds appear null-filled before
 *    their birth version, drops disappear, widened history upcasts) —
 *    fail-once-adopt-on-restart, never a stuck stream.
 *  - `allowAdditive`: `identity`, except a column added after the pin
 *    does NOT fail — it stays invisible until a restart adopts it
 *    (for consumers that prefer availability over schema currency).
 *  - `nullFill`: the legacy by-name contract — absent columns
 *    null-fill, extra columns drop, nothing ever fails. Matches the
 *    batch change-feed TVF; for consumers keyed on stable ids only.
 *
 * Vacuum retention on the table must exceed consumer lag
 * ([[Snapshot.changeSet]] needs each version's parent manifest; same
 * contract as the `_log/` follower).
 */
private[graft] class GraftStreamSource(spark: SparkSession, path: String,
                                       startExclusive: Int,
                                       emitLayoutOps: Boolean,
                                       maxVersionsPerBatch: Int = 0,
                                       maxRowsPerBatch: Long = 0L,
                                       onSchemaChange: String = "identity")
  extends Source {

  private val pinnedVersion: Int = Snapshot.currentVersion(path)
  private val pinnedManifest = Snapshot.readManifest(path, pinnedVersion)
  private val dataSchema: StructType =
    GraftDataSource.logicalSchema(path, pinnedVersion)
  // pinned logical name -> the physical name its bytes live under
  private val pinnedPhys: Map[String, String] =
    dataSchema.fields.map(f => f.name -> pinnedManifest.phys(f.name)).toMap

  override val schema: StructType = StructType(dataSchema.fields ++ Seq(
    StructField("_change", StringType, nullable = false),
    StructField("_version", IntegerType, nullable = false)))

  // Rate-limit anchors. `consumed` re-anchors on every getBatch (the
  // authoritative signal — on restart the first constructed batch
  // carries the checkpointed start offset). `offered` additionally
  // advances per getOffset poll, which keeps a RESTARTED stream live:
  // a fresh source instance can't see the checkpoint, so its first
  // capped offer may equal the already-committed offset (one idle
  // trigger cycle); the next poll offers k further and progress
  // resumes. Between two polls either a batch runs (re-anchoring
  // consumed) or the offer matched the committed offset, so no batch
  // ever spans more than k versions past what was actually processed.
  @volatile private var consumed: Int = startExclusive
  @volatile private var offered: Int = startExclusive

  // per-version gross change rows, memoized (manifests are immutable)
  private val changeRows =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
  private def rowsOf(v: Int): Long =
    changeRows.computeIfAbsent(v, x => Snapshot.changeRowCount(path, x))

  override def getOffset: Option[LegacyOffset] = {
    val cur = Snapshot.currentVersion(path)
    val anchor = math.max(consumed, offered)
    val capped =
      if (maxVersionsPerBatch <= 0 && maxRowsPerBatch <= 0L) cur
      else {
        val vCap =
          if (maxVersionsPerBatch <= 0) cur
          else math.min(cur, anchor + maxVersionsPerBatch)
        if (maxRowsPerBatch <= 0L) vCap
        else {
          // accrue versions until the NEXT would blow the row budget;
          // always take at least one (an oversized commit ships alone)
          var end = anchor
          var rows = 0L
          var done = false
          while (!done && end < vCap) {
            val r = rowsOf(end + 1)
            if (end > anchor && rows + r > maxRowsPerBatch) done = true
            else { end += 1; rows += r }
          }
          end
        }
      }
    offered = math.max(offered, capped)
    if (capped > startExclusive) Some(GraftVersionOffset(capped)) else None
  }

  private def versionOf(o: LegacyOffset): Int = o match {
    case GraftVersionOffset(v) => v
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  /** Net-zero-by-contract layout ops, skipped unless `emitLayoutOps`. */
  private val layoutOps = Set("compact", "relayout")

  override def getBatch(start: Option[LegacyOffset],
                        end: LegacyOffset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startExclusive)
    val to = versionOf(end)
    consumed = math.max(consumed, to)
    val frames = ((from + 1) to to).flatMap { v =>
      val m = Snapshot.readManifest(path, v)
      if (!emitLayoutOps && layoutOps.contains(m.op)) None
      else {
        // the removed side is read under the PARENT version's schema
        // (an additive-carrying merge changes schema within one
        // commit), so each side aligns under its own manifest
        val mP = if (m.parent > 0) Snapshot.readManifest(path, m.parent) else m
        val (removed, added) = Snapshot.changeSet(spark, path, v)
        Some(aligned(added, m).withColumn("_change", lit("added"))
          .withColumn("_version", lit(v))
          .unionByName(aligned(removed, mP).withColumn("_change", lit("removed"))
            .withColumn("_version", lit(v))))
      }
    }
    val batch = frames.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    // a V1 Source must hand back a STREAMING-tagged frame
    org.apache.spark.sql.graft.SqlBridge.asStreamingFrame(spark, batch)
  }

  /** Align a change-set frame (read under manifest `m`'s logical
    * schema) to the stream's pinned schema. Mode `nullFill` (and any
    * pre-schema manifest, which cannot evolve) aligns by NAME: absent
    * columns null-fill, extras drop. Otherwise alignment is by
    * PHYSICAL identity through the column map — see the class doc for
    * the full contract. Selection exprs are memoized per manifest
    * version (manifests are immutable); a version whose schema cannot
    * be rendered faithfully throws BEFORE any row ships. */
  private def aligned(df: DataFrame, m: Snapshot.Manifest): DataFrame =
    if (onSchemaChange == "nullFill" || m.schemaDdl.isEmpty ||
        pinnedManifest.schemaDdl.isEmpty)
      df.select(dataSchema.fields.map { f =>
        // cast is a no-op at the pinned type; it pins the frame's type
        // when history was written under a narrower (pre-widen) one
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    else df.select(alignCols.computeIfAbsent(m.version, _ => planAlign(m)): _*)

  // per-version alignment plans (or the refusal, thrown at plan time)
  private val alignCols =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[Column]]()

  /** Lossless int→bigint / float→double — the only widenings the
    * format admits, so the only casts history replay ever needs. */
  private def upcastable(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (IntegerType, LongType) | (FloatType, DoubleType) => true
      case _ => false
    }

  private def planAlign(m: Snapshot.Manifest): Seq[Column] = {
    def fail(what: String): Nothing = throw new StreamSchemaChangedException(
      s"graft stream at $path: $what crossed the stream at version " +
        s"${m.version} (op '${m.op}'; the stream's schema was pinned at " +
        s"version $pinnedVersion). Restart the query from the SAME " +
        "checkpoint to adopt the current table schema — the boundary " +
        "batch replays losslessly under it. To keep this stream running " +
        "across additive changes instead, set onSchemaChange=allowAdditive " +
        "(new columns stay invisible until a restart); " +
        "onSchemaChange=nullFill restores by-name alignment with no checks.")
    val vFields = StructType.fromDDL(m.schemaDdl).fields
    // physical name -> (logical name at m, type at m)
    val byPhys: Map[String, (String, DataType)] =
      vFields.map(f => m.phys(f.name) -> (f.name, f.dataType)).toMap
    if (m.version > pinnedVersion && onSchemaChange != "allowAdditive") {
      val born = vFields.map(f => (f.name, m.phys(f.name)))
        .filterNot(x => pinnedPhys.values.exists(_ == x._2)).map(_._1)
      if (born.nonEmpty)
        fail(s"column(s) ${born.mkString("'", "', '", "'")} added")
    }
    dataSchema.fields.toSeq.map { f =>
      byPhys.get(pinnedPhys(f.name)) match {
        case Some((atV, t)) if t == f.dataType => col(atV).as(f.name)
        case Some((atV, t)) if upcastable(t, f.dataType) =>
          col(atV).cast(f.dataType).as(f.name)
        case Some((_, t)) =>
          fail(s"column '${f.name}' type change " +
            s"${f.dataType.simpleString} -> ${t.simpleString}")
        case None if m.retiredCols.contains(pinnedPhys(f.name)) =>
          fail(s"column '${f.name}' dropped")
        case None => // the column did not exist yet at m's version
          lit(null).cast(f.dataType).as(f.name)
      }
    }
  }

  override def commit(end: LegacyOffset): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()
}

/** A version number as a streaming offset (`json` = the number). */
private[graft] case class GraftVersionOffset(version: Int) extends LegacyOffset {
  override def json: String = version.toString
}

/** A schema evolution the change-feed stream cannot render faithfully
  * under its pinned schema crossed the batch range — thrown before any
  * row ships; the message carries the restart remedy. */
final class StreamSchemaChangedException(msg: String)
  extends RuntimeException(msg)
