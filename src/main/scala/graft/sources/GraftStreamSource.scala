package graft.sources

import graft.operators.Snapshot

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

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
 * The schema is pinned at stream start (tip manifest + `_change`,
 * `_version`); change sets from versions before a rename/evolution
 * align by name — absent columns null-fill, exactly how the batch
 * change-feed TVF behaves across evolution. Vacuum retention on the
 * table must exceed consumer lag ([[Snapshot.changeSet]] needs each
 * version's parent manifest; same contract as the `_log/` follower).
 */
private[graft] class GraftStreamSource(spark: SparkSession, path: String,
                                       startExclusive: Int,
                                       emitLayoutOps: Boolean,
                                       maxVersionsPerBatch: Int = 0,
                                       maxRowsPerBatch: Long = 0L) extends Source {

  private val dataSchema: StructType =
    GraftDataSource.logicalSchema(path, Snapshot.currentVersion(path))

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
      val op = Snapshot.readManifest(path, v).op
      if (!emitLayoutOps && layoutOps.contains(op)) None
      else {
        val (removed, added) = Snapshot.changeSet(spark, path, v)
        Some(aligned(added).withColumn("_change", lit("added"))
          .withColumn("_version", lit(v))
          .unionByName(aligned(removed).withColumn("_change", lit("removed"))
            .withColumn("_version", lit(v))))
      }
    }
    val batch = frames.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    // a V1 Source must hand back a STREAMING-tagged frame
    org.apache.spark.sql.graft.SqlBridge.asStreamingFrame(spark, batch)
  }

  /** Align a change-set frame (read under ITS version's schema) to
    * the stream's pinned schema: absent columns null-fill, renamed/
    * added-later columns drop — by-name, the evolution contract. */
  private def aligned(df: DataFrame): DataFrame =
    df.select(dataSchema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)

  override def commit(end: LegacyOffset): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()
}

/** A version number as a streaming offset (`json` = the number). */
private[graft] case class GraftVersionOffset(version: Int) extends LegacyOffset {
  override def json: String = version.toString
}
