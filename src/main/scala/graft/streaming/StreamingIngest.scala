package graft.streaming

import graft.meta.ValidationRule
import graft.operators.Validate
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming equivalents of the batch ingest surface: the
 * same metadata-compiled validation Columns run unchanged over a
 * stream (reference is batch-only; its Airflow DAG re-runs the batch
 * pipeline — graft's streaming path is the always-on version).
 *
 * Scale notes: validation is stateless (one projection, no shuffle);
 * windowed counts carry watermarked state bounded by
 * (#keys × window); sessionization state is one small struct per
 * active user, dropped on timeout. All sinks are exactly-once under
 * checkpointing (file sinks) / at-least-once (foreachBatch).
 */
object StreamingIngest {

  /** JSON-lines directory stream with an explicit schema (schema
    * inference is not available — nor wanted — on streams). */
  def jsonStream(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.readStream.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).json(path)

  /** Tag a stream with validation_errors/is_valid — identical Column
    * tree to the batch path (same metadata, same semantics). */
  def validated(stream: DataFrame, rules: Seq[ValidationRule]): DataFrame =
    Validate.tagged(stream, rules)

  /**
   * OK/KO split writer: ONE pass per micro-batch, partitioned by
   * validity at the sink (no double filter/scan). Parquet output
   * `.../is_valid=true|false/` gives downstream readers partition
   * pruning on validity.
   */
  def okKoWriter(stream: DataFrame, rules: Seq[ValidationRule],
                 outPath: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    validated(stream, rules)
      .withColumn(Validate.ErrorsCol, concat_ws(",", col(Validate.ErrorsCol)))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy(Validate.ValidCol)
      .outputMode(OutputMode.Append)

  /**
   * Streaming EXACT DEDUP: drop records whose content fingerprint was
   * already seen, with state bounded by a watermark — the always-on
   * form of `Dedup.exact` for ingest pipelines (a re-crawled or
   * re-delivered document must not enter the corpus twice). State per
   * key is one 32-char fingerprint row, expired `delay` past the
   * event time, so the state store stays proportional to the dedup
   * horizon, not the stream's history.
   */
  def dedupStream(stream: DataFrame, content: String, tsCol: String,
                  delay: String = "1 hour"): DataFrame =
    stream
      .withColumn("__fp", md5(col(content)))
      .withWatermark(tsCol, delay)
      // WithinWatermark variant: plain dropDuplicates(fp) would keep
      // fingerprint state forever; this one expires state once the
      // watermark passes first-seen + delay
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /**
   * STREAM-STATIC ENRICHMENT: join each micro-batch against a static
   * dimension frame (no streaming state at all — the static side is
   * planned per batch, broadcast when small). The streaming twin of
   * the batch dimension join: `how` defaults to "left" so unmatched
   * stream rows pass through with nulls rather than being dropped
   * mid-pipeline.
   *
   * At scale: hint the dimension side with `broadcast(dim)` at the
   * call site when it fits (the usual case); a large dimension falls
   * back to a shuffled join per micro-batch, which is still correct
   * but motivates pre-bucketing the dimension table.
   */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   keys: Seq[String], how: String = "left"): DataFrame =
    stream.join(dim, keys, how)

  /**
   * STREAMING DECONTAMINATION: drop every arriving document whose
   * normalized fingerprint (whitespace/case/order-insensitive, same
   * kernel as the batch `Dedup.decontaminate`) matches the static
   * benchmark frame — the ingest-time guard that keeps eval leakage
   * out of a continuously-growing corpus instead of cleaning it after
   * the fact. Stream-static anti joins are stateless: the benchmark
   * is re-planned per micro-batch (broadcast when small), no
   * watermark or state store involved.
   */
  def decontaminateStream(stream: DataFrame, content: String,
                          benchmark: DataFrame, benchContent: String): DataFrame =
    // the batch kernel is plan-compatible with a streaming left side —
    // one implementation, one set of fingerprint semantics
    graft.operators.Dedup.decontaminate(stream, col(content),
      benchmark, col(benchContent))

  /**
   * STREAM-STREAM INTERVAL JOIN: match rows of two live streams whose
   * event times fall within `within` of each other (click-to-view
   * attribution, request/response pairing, impression↔conversion).
   * Both sides carry a watermark and the join condition bounds the
   * right timestamp into [left − within, left + within], so Spark can
   * prove state eviction: each side buffers only `watermark + within`
   * of history — bounded state at any throughput, the requirement for
   * running attribution on an unbounded stream.
   */
  def joinStreams(left: DataFrame, right: DataFrame,
                  key: String, leftTs: String, rightTs: String,
                  within: String = "10 minutes",
                  delay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - org.apache.spark.sql.functions.expr(s"INTERVAL $within") &&
        r(rightTs) <= l(leftTs) + org.apache.spark.sql.functions.expr(s"INTERVAL $within"))
  }

  /**
   * Watermarked tumbling-window counts per event_type:
   * (window, event_type, n, sum_value). State is dropped
   * `delay` past the window end.
   */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     window: String = "1 hour", delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))

  /**
   * NATIVE streaming sessionization: Spark's built-in `session_window`
   * aggregation — gap-merged session state managed by the engine, with
   * watermark-driven eviction and codegen. Prefer this when a session
   * is just windowed AGGREGATES (counts/sums over the interval); the
   * `flatMapGroupsWithState` [[sessionize]] below remains for custom
   * per-session state machines (e.g. emit-on-idle with bespoke
   * payloads). Sessions emit once the watermark passes their end.
   */
  def sessionWindowCounts(events: DataFrame, userCol: String = "user_id",
                          tsCol: String = "ts", gap: String = "30 minutes",
                          delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(userCol),
        org.apache.spark.sql.functions.session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("sess_events"))
      .select(col(userCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("sess_events"))

  // -- custom state: gap-based streaming sessionization ---------------

  final case class SessionEvent(userId: Long, tsMs: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /**
   * flatMapGroupsWithState sessionizer: emits a session row when a
   * user goes quiet for `gapMs` (event-time order within a batch;
   * processing-time timeout closes idle sessions). The streaming twin
   * of the batch `q_sessions` window query.
   *
   * `timeout = NoTimeout` disables idle-close (sessions then only
   * close when a later event arrives past the gap) — used by specs,
   * because pending processing-time timeouts keep scheduling batches
   * and `processAllAvailable` never settles.
   */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.last, s.n))
          } else {
            val sorted = it.map(_.tsMs).toArray.sorted
            var cur = state.getOption
            val closed = Iterator.newBuilder[SessionOut]
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.last <= gapMs =>
                  cur = Some(s.copy(last = ts, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.result()
          }
      }
  }

  // -- streaming CMS heavy-hitters sink --------------------------------

  /**
   * STREAMING CMS HEAVY-HITTERS SINK — the streaming twin of the
   * batch `skew_keys` probe. Each micro-batch folds the key column
   * into ONE Count-Min sketch row (sum-mergeable counters) plus the
   * batch's top-`candidatesPerBatch` keys, appended to a parquet
   * sketch log via foreachBatch. Raw events are never retained: a day
   * of 10^11 events compacts to batches × (depth·width·8 B + a few
   * candidate keys), and [[cmsTopHotKeys]] answers "hot keys over any
   * period" from that log alone with one tiny scan.
   *
   * The candidate log bounds the answer set (a CMS can score any key
   * but cannot enumerate keys). Per-batch top-`m` alone would miss a
   * key hot in AGGREGATE but never locally frequent (traffic spread
   * thinner than the batch floor in every batch), so the sink also
   * maintains a CUMULATIVE HEAP: each batch rescores (previous heap ∪
   * this batch's distinct keys) against the merged sketch log —
   * cumulative estimates, not batch counts — and appends the top `m`
   * as that batch's heap row set. A key can only be excluded from the
   * final heap if, at its last appearance, `m` other keys already
   * held cumulative estimates at or above its FULL cumulative count
   * (CMS never underestimates) — so any key whose true total clears
   * the m-th true count by the sketch's εN envelope survives
   * (adversarial spec: hot-overall-but-never-per-batch-top-m is
   * found). The per-batch rescoring job is sketch-broadcast ×
   * batch-distinct-keys — bounded by batch size, never by history.
   * Estimates come from the UNIONED sketch, so a candidate's count
   * includes every batch, including ones where it was not a
   * candidate. foreachBatch is at-least-once: a replayed batch
   * appends duplicate sketch/heap rows keyed by batch_id, and readers
   * dedup on it (cmsTopHotKeys does); the heap recompute is
   * deterministic, so replayed heap rows are byte-identical.
   */
  def cmsHeavyHittersSink(stream: DataFrame, keyCol: String, outPath: String,
                          checkpoint: String, candidatesPerBatch: Int = 64,
                          depth: Int = graft.functions.CmsExprs.DefaultDepth,
                          width: Int = graft.functions.CmsExprs.DefaultWidth)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = batch.select(col(keyCol).as("k")).persist()
        // one groupBy serves BOTH the per-batch candidate write and
        // the heap's key universe — a second distinct pass over the
        // batch was most of the sink's fixed per-batch cost
        val counts = keyed.groupBy("k").agg(count(lit(1)).as("n")).persist()
        try {
          keyed.agg(
              graft.functions.CmsExprs.cmsSketch(col("k"), depth, width)
                .as("sketch"),
              count(lit(1)).as("n_rows"))
            .withColumn("batch_id", lit(batchId))
            .coalesce(1).write.mode("append").parquet(s"$outPath/sketches")
          counts
            .orderBy(col("n").desc, col("k"))
            .limit(candidatesPerBatch)
            .select(col("k"), lit(batchId).as("batch_id"))
            .coalesce(1).write.mode("append").parquet(s"$outPath/candidates")
          // cumulative heap: previous heap keys ∪ this batch's keys,
          // rescored by CUMULATIVE estimate (merged sketch log, which
          // already includes this batch's row written above)
          val ss = batch.sparkSession
          val merged = ss.read.parquet(s"$outPath/sketches")
            .groupBy("batch_id").agg(first(col("sketch")).as("sketch"))
            .agg(graft.functions.CmsExprs.cmsUnion(col("sketch")).as("sk"))
          val heapDir = s"$outPath/heap"
          val prevKeys =
            if (graft.operators.LogStore.forPath(heapDir).exists(heapDir)) {
              // live heap = the LATEST batch's row set (earlier rows are
              // history; rescoring them too would grow per-batch work
              // with batch count instead of batch size). max(batch_id)
              // is NULL when every prior batch was empty (a rate
              // stream's batch 0 usually is) — the heap dir then exists
              // with zero rows, and an unguarded getLong killed the
              // query at batch 1.
              val prev = ss.read.parquet(heapDir)
              val latest = prev.agg(max(col("batch_id"))).first()
              if (latest.isNullAt(0)) keyed.limit(0).select(col("k"))
              else prev.filter(col("batch_id") === latest.getLong(0))
                .select(col("k")).distinct()
            } else keyed.limit(0).select(col("k"))
          counts.select(col("k")).unionByName(prevKeys).distinct()
            .crossJoin(broadcast(merged))
            .select(col("k"),
              graft.functions.CmsExprs.cmsEstimate(col("sk"), col("k")).as("est_n"))
            .orderBy(col("est_n").desc, col("k"))
            .limit(candidatesPerBatch)
            .withColumn("batch_id", lit(batchId))
            .coalesce(1).write.mode("append").parquet(heapDir)
        } finally { counts.unpersist(); keyed.unpersist(); () }
      }
      .start()

  // -- streaming CDC merge apply ---------------------------------------

  /**
   * STREAMING MERGE APPLY — the streaming composition of the keyed
   * copy-on-write merge sink ([[graft.operators.Merge.mergeInto]],
   * #146) with a change-data stream: each micro-batch of CDC rows
   * (target schema + a sequence column + a delete flag) is collapsed
   * to its LAST change per key and applied to the hive-partitioned
   * target, rewriting only the partitions containing changed keys.
   * The always-on form of the incremental-refresh pipeline: a 2%/day
   * trickle of updates never rewrites the other 98% of a 100 TB
   * table, and downstream batch readers always see a consistent
   * old-or-new state per partition.
   *
   * Batch-local collapse: a key appearing more than once in one
   * micro-batch keeps the row with the greatest `seqCol` (ties broken
   * delete-over-upsert, then arbitrary-but-deterministic by the flag —
   * give changes distinct sequence numbers); the collapse guarantees
   * [[graft.operators.Merge.mergeInto]]'s no-key-in-both-frames
   * precondition by construction. Cross-batch ordering is the
   * stream's: micro-batches apply in order, so last-writer-wins holds
   * end-to-end when the source delivers changes in `seqCol` order
   * (the normal CDC contract).
   *
   * Bootstrap: a missing target directory is seeded from the first
   * batch's surviving upserts via a plain partitioned write.
   *
   * Delivery: foreachBatch is at-least-once. A replayed batch
   * re-applies the SAME collapsed change set, and mergeInto is
   * idempotent for a fixed change set (upserts replace, deletes of
   * absent keys no-op), so the failure-replay of the most recent
   * batch converges to the same table — spec-asserted.
   */
  def cdcMergeSink(stream: DataFrame, targetPath: String, checkpoint: String,
                   key: String, partitionCol: String, seqCol: String,
                   deletedCol: String = "__deleted",
                   format: String = "parquet")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, targetPath, key, partitionCol, seqCol,
          deletedCol, format)
      }
      .start()

  /** One micro-batch of [[cdcMergeSink]] — factored out so specs can
    * replay a batch body directly (the at-least-once idempotence
    * assertion) without driving a second stream. */
  private[graft] def applyCdcBatch(batch: DataFrame, targetPath: String,
                                   key: String, partitionCol: String,
                                   seqCol: String, deletedCol: String,
                                   format: String): Unit = {
    val isDel = coalesce(col(deletedCol), lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(seqCol).desc, isDel.desc)
    val last = batch
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    val dataCols = batch.columns
      .filterNot(c => c == seqCol || c == deletedCol).map(col)
    val ups = last.filter(!isDel).select(dataCols: _*)
    val dels = last.filter(isDel).select(col(key))
    val targetExists =
      graft.operators.LogStore.forPath(targetPath).list(targetPath)
        .exists { case (n, _) => !n.startsWith(".") && !n.startsWith("_") }
    if (!targetExists)
      ups.write.mode("overwrite").format(format)
        .partitionBy(partitionCol).save(targetPath)
    else {
      graft.operators.Merge.mergeInto(batch.sparkSession,
        targetPath, ups, dels, key, partitionCol, format)
      ()
    }
  }

  /**
   * [[cdcMergeSink]]'s VERSIONED twin: apply the change stream to a
   * [[graft.operators.Snapshot]] table — each micro-batch collapses to
   * the last change per key (same seq/delete-ties rule) and lands as
   * ONE atomic commit, so the table's version log IS the batch audit
   * trail: any historical state is `readAt` away, a bad batch is one
   * `rollback` away, and readers never see a half-applied batch (the
   * cross-partition atomicity [[cdcMergeSink]]'s plain-hive target
   * documents as out of scope). A missing table bootstraps at v1 from
   * the first batch. At-least-once replay converges: the collapse is
   * deterministic and re-merging an applied change set commits a
   * content-identical version.
   */
  def cdcSnapshotSink(stream: DataFrame, tablePath: String, checkpoint: String,
                      key: String, partitionCol: String, seqCol: String,
                      deletedCol: String = "__deleted",
                      statsCols: Seq[String] = Nil,
                      audit: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    // `audit` turns every batch commit WRITE-AUDIT-PUBLISH
    // (Snapshot.wapMerge): the post-merge state is audited while
    // staged, so a poison batch (a CDC storm eroding a partition, a
    // bug wiping a group) FAILS THE QUERY instead of publishing — the
    // table stays at its last good version and the stream restarts
    // from the checkpoint after the upstream fix; nothing to roll back
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcSnapshotBatch(batch, tablePath, key, partitionCol, seqCol,
          deletedCol, statsCols, audit)
      }
      .start()

  private[graft] def applyCdcSnapshotBatch(batch: DataFrame, tablePath: String,
                                           key: String, partitionCol: String,
                                           seqCol: String, deletedCol: String,
                                           statsCols: Seq[String],
                                           audit: Seq[String] = Nil): Unit = {
    val isDel = coalesce(col(deletedCol), lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(seqCol).desc, isDel.desc)
    val last = batch
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    val dataCols = batch.columns
      .filterNot(c => c == seqCol || c == deletedCol).map(col)
    val ups = last.filter(!isDel).select(dataCols: _*)
    val dels = last.filter(isDel).select(col(key))
    if (!graft.operators.Snapshot.exists(tablePath))
      graft.operators.Snapshot.create(batch.sparkSession, tablePath, ups,
        key, partitionCol, statsCols)
    else if (audit.nonEmpty)
      graft.operators.Snapshot.wapMerge(batch.sparkSession, tablePath, ups,
        dels, audit)
    else
      graft.operators.Snapshot.merge(batch.sparkSession, tablePath, ups, dels)
    ()
  }

  /**
   * STREAMING ERASURE SINK — a stream of keys to forget (GDPR
   * requests, retraction feeds) applied to a snapshot table as
   * MERGE-ON-READ deletes ([[graft.operators.Snapshot.deleteMorKeys]]):
   * each micro-batch is one deletion-vector commit — zero data files
   * rewritten, cost ∝ batch keys (bloom/stats-pruned), the table's
   * version log doubling as the erasure audit trail. Exactly-once
   * WITHOUT a ledger: replaying a batch re-masks the same positions,
   * and the vector union is idempotent by construction (positions
   * only accumulate) — the replayed commit is visible-state-identical,
   * so at-least-once delivery needs no dedup machinery at all. Run
   * [[graft.operators.Snapshot.compact]] on whatever cadence
   * amortizes the read tax (MORBENCH.md measures the trade).
   */
  def erasureSink(keys: DataFrame, tablePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyErasureBatch(batch, tablePath)
      }
      .start()

  private[graft] def applyErasureBatch(batch: DataFrame,
                                       tablePath: String): Unit = {
    if (!batch.isEmpty)
      graft.operators.Snapshot.deleteMorKeys(batch.sparkSession,
        tablePath, batch)
    ()
  }

  /**
   * Read a [[cmsHeavyHittersSink]] log and rank the hot keys: union
   * every batch sketch into one (dedup'd by batch_id against
   * at-least-once replays), then score the distinct union of the
   * per-batch candidates AND the cumulative heap keys against it
   * (the heap is what recovers keys hot in aggregate but never
   * per-batch frequent). Returns (k, est_n) top-`k` by estimate. The
   * scan is sketch-sized, not event-sized — the whole point.
   */
  /**
   * Streaming DISTINCT-COUNT sink — the cardinality companion of
   * [[cmsHeavyHittersSink]]: per micro-batch, append ONE mergeable HLL
   * sketch row per group (`groupCol`, e.g. event_type) keyed by
   * batch_id. "How many distinct users per event type, ever / over any
   * batch range" is then answered from the sketch log alone by
   * [[hllDistinctByGroup]] — a KB-sized scan however many events
   * passed through, the state-bound shape exact streaming distinct
   * cannot have (its state grows with the distinct universe).
   *
   * foreachBatch is at-least-once: a replayed batch appends a
   * duplicate (group, batch_id) row; readers dedup on batch_id before
   * the union, and HLL register-max makes the union idempotent anyway
   * (re-merging the same sketch is a no-op) — both layers hold.
   */
  def hllDistinctSink(stream: DataFrame, keyCol: String, groupCol: String,
                      outPath: String, checkpoint: String, p: Int = 12)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy(col(groupCol).cast("string").as("g"))
          .agg(graft.functions.HllExprs.hllSketch(col(keyCol), p).as("sketch"),
            count(lit(1)).as("n_rows"))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1).write.mode("append").parquet(s"$outPath/sketches")
        ()
      }
      .start()

  /**
   * Read a [[hllDistinctSink]] log and estimate distinct keys per
   * group: dedup (group, batch_id) against at-least-once replays,
   * union each group's sketches, estimate. Returns
   * (g, est_distinct, n_rows) — the row count rides along exactly
   * (a sum over the deduped log), so exact-volume and
   * approx-cardinality come from the same tiny scan.
   */
  def hllDistinctByGroup(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/sketches")
      .groupBy("g", "batch_id")
      .agg(first(col("sketch")).as("sketch"), first(col("n_rows")).as("n_rows"))
      .groupBy("g")
      .agg(graft.functions.HllExprs.hllUnion(col("sketch")).as("sk"),
        sum(col("n_rows")).as("n_rows"))
      .select(col("g"),
        graft.functions.HllExprs.hllEstimate(col("sk")).as("est_distinct"),
        col("n_rows"))

  // -- streaming near-duplicate dedup sink -----------------------------

  /**
   * STREAMING NEAR-DUP DEDUP — the always-on form of MinHash+LSH
   * near-dup (the batch operator family at
   * [[graft.operators.Dedup.minhashLsh]]), closing the gap between
   * [[dedupStream]] (exact fingerprints only) and the batch
   * incremental index (`Dedup.ngramJaccardIncremental`): a micro-batch
   * document is admitted to the corpus only if it is NOT a
   * near-duplicate of (a) any previously admitted document or (b) a
   * smaller-id document of its own batch. Admitted rows append to
   * `$out/data`; their MinHash signatures and LSH band keys append to
   * `$out/store/{sigs,bands}` — the only state the next batch probes.
   * Raw history is never rescanned: per batch the work is its own
   * signature pass plus a band-key equi-join against the store
   * (shuffle keyed on (band, band_hash), candidates rescored by
   * signature-position equality — the same LSH-then-estimate
   * construction and estimator as the batch operator), so cost scales
   * with |batch| × fan-out, never |corpus|².
   *
   * The admission policy is declarative, not greedy: drop iff a
   * candidate match ≥ `threshold` exists against the store or against
   * ANY smaller-id batch doc. The admitted corpus is therefore
   * PAIRWISE near-dup-free at the detection threshold — any two
   * admitted same-batch docs produced no qualifying pair, and an
   * admitted doc matched nothing admitted before it. A within-batch
   * chain (a~b, b~c, a≁c) drops BOTH b and c — slightly more
   * aggressive than per-cluster representative selection, identical
   * on every chain-free corpus, and never admits a duplicate.
   *
   * foreachBatch is at-least-once: every write carries batch_id, and
   * the store probe ignores rows with `batch_id >= current` (a
   * replayed batch's own rows are already in the store — without the
   * guard every doc would self-match and the replay would admit
   * nothing). Replays therefore recompute the identical survivor set
   * and append byte-identical rows, which [[nearDedupCorpus]] drops.
   *
   * State growth: one signature row (`numHashes` longs) + `bands`
   * band rows per ADMITTED doc — proportional to the deduped corpus,
   * not the stream; compactable offline like any append log. Docs
   * with fewer than `k` tokens have no shingles, match nothing, and
   * are admitted as-is (same contract as the batch operators, which
   * drop them from the signature frame).
   */
  def nearDedupSink(stream: DataFrame, content: String, id: String,
                    outPath: String, checkpoint: String,
                    k: Int = 3, numHashes: Int = 32, bands: Int = 16,
                    threshold: Double = 0.7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyNearDedupBatch(batch, batchId, content, id, outPath,
          k, numHashes, bands, threshold)
      }
      .start()

  /** One micro-batch of [[nearDedupSink]] — also the replay surface
    * the spec drives directly (same batchId ⇒ byte-identical appends). */
  private[graft] def applyNearDedupBatch(batch: DataFrame, batchId: Long,
      content: String, id: String, outPath: String,
      k: Int, numHashes: Int, bands: Int, threshold: Double): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val ss = batch.sparkSession
    import graft.operators.Dedup
    val cached = batch.persist()
    val sigs = Dedup.minhashSignatures(cached, col(content), col(id),
      k, numHashes).persist()
    try {
      val bandedB = Dedup.bandFrame(sigs, bands, rows)
      val sigsDir = s"$outPath/store/sigs"
      val bandsDir = s"$outPath/store/bands"
      val est = graft.functions.VectorExprs
        .longVecEqCount(col("sig_a"), col("sig_b")).cast("double") / numHashes
      // (1) cross-batch: band-key equality against admitted docs of
      // STRICTLY EARLIER batches (replay guard), estimate from the
      // signature pair
      val dupStore =
        if (graft.operators.LogStore.forPath(bandsDir).exists(bandsDir)) {
          val storeBands = ss.read.parquet(bandsDir)
            .filter(col("batch_id") < batchId)
            .select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
            .dropDuplicates("doc_b", "band") // replayed appends
          val storeSigs = ss.read.parquet(sigsDir)
            .filter(col("batch_id") < batchId)
            .select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
            .dropDuplicates("doc_b")
          bandedB
            .select(col("doc_id"), col("sig").as("sig_a"),
              col("band"), col("band_hash"))
            .join(storeBands, Seq("band", "band_hash"))
            .select("doc_id", "sig_a", "doc_b").distinct()
            .join(storeSigs, "doc_b")
            .filter(est >= threshold)
            .select("doc_id").distinct()
        } else sigs.select("doc_id").limit(0)
      // (2) within-batch: a qualifying pair with ANY smaller-id doc
      val dupLocal = bandedB.as("a").join(bandedB.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"), col("a.sig").as("sig_a"),
          col("b.sig").as("sig_b"))
        .distinct()
        .filter(est >= threshold)
        .select("doc_id").distinct()
      val dropped = dupStore.unionByName(dupLocal).distinct().persist()
      val admittedSigs = sigs.join(dropped, Seq("doc_id"), "left_anti").persist()
      // admitted rows: survivors + shingle-less docs (nothing to match)
      cached.join(dropped.withColumnRenamed("doc_id", id), Seq(id), "left_anti")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(s"$outPath/data")
      admittedSigs.withColumn("batch_id", lit(batchId))
        .coalesce(1).write.mode("append").parquet(sigsDir)
      Dedup.bandFrame(admittedSigs, bands, rows).drop("sig")
        .withColumn("batch_id", lit(batchId))
        .coalesce(1).write.mode("append").parquet(bandsDir)
      dropped.unpersist(); admittedSigs.unpersist()
      ()
    } finally { sigs.unpersist(); cached.unpersist(); () }
  }

  /** The admitted corpus of a [[nearDedupSink]] log, replay-safe:
    * at-least-once re-appends are byte-identical (deterministic
    * recompute under the batch_id guard), so one dropDuplicates on
    * (id, batch_id) restores exactly-once semantics. */
  def nearDedupCorpus(spark: SparkSession, outPath: String,
                      id: String): DataFrame =
    spark.read.parquet(s"$outPath/data").dropDuplicates(id, "batch_id")

  /**
   * Streaming CLUSTER LABELS — the online twin of
   * [[graft.operators.Dedup.duplicateClustersIncremental]]: where
   * [[nearDedupSink]] DROPS near-dups at the door, this sink KEEPS
   * everything and maintains the `(doc_id, cluster_id)` component
   * labels as the stream grows — the corpus-hygiene view (who
   * duplicates whom) updated per micro-batch at delta cost.
   *
   * Per batch: minhash signatures + band keys append to the store;
   * candidate pairs come from band collisions against STRICTLY
   * EARLIER batches plus within-batch, kept at minhash-estimate ≥
   * `threshold` (the [[nearDedupSink]] trade — no shingle sets in
   * state); the pair delta folds into the previous labels via the
   * incremental CC, and the new labels land under
   * `labels/b<batchId>/` — readers take the highest batch
   * ([[clusterLabels]]).
   *
   * At-least-once replay is idempotent end-to-end: a replayed batch
   * recomputes its pair delta identically (the earlier-batch guard
   * ignores its own store rows), reads the labels of the highest
   * batch BELOW itself, and re-folding already-merged edges is a
   * fixed point of the CC — the rewritten labels dir is
   * content-identical.
   *
   * Contract: ids are unique across the stream (the same corpus
   * invariant the batch operators state) — a re-delivered id with
   * DIFFERENT content would leave two signatures under one key in
   * the store; route updates through exact dedup upstream.
   */
  def clusterLabelsSink(stream: DataFrame, content: String, id: String,
                        outPath: String, checkpoint: String,
                        k: Int = 3, numHashes: Int = 32, bands: Int = 16,
                        threshold: Double = 0.7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyClusterLabelsBatch(batch, batchId, content, id, outPath,
          k, numHashes, bands, threshold)
      }
      .start()

  private def labelBatches(outPath: String): Seq[Long] =
    graft.operators.LogStore.forPath(outPath).list(s"$outPath/labels")
      .collect { case (n, true) if n.startsWith("b") => n.drop(1).toLong }
      .sorted

  /** The current label table of a [[clusterLabelsSink]] log. */
  def clusterLabels(spark: SparkSession, outPath: String): DataFrame = {
    val bs = labelBatches(outPath)
    require(bs.nonEmpty, s"no label batches under $outPath/labels")
    spark.read.parquet(s"$outPath/labels/b${bs.last}")
  }

  /** Reclaim superseded label batches (each batch writes a full
    * snapshot, so only the tip is live; earlier dirs exist solely for
    * the replay window). Keeps the highest `retainLast` batch dirs.
    * `retainLast >= 2` is REQUIRED, not advisory: an at-least-once
    * replay of the tip batch looks for the label dir BELOW its own
    * batch id — with only the tip retained it would find none and
    * rebuild labels from the batch's pair delta alone, silently
    * discarding every earlier component in exactly the crash window
    * vacuum must preserve. Two dirs = the tip plus the predecessor
    * the tip's replay folds from. */
  def clusterLabelsVacuum(outPath: String, retainLast: Int = 2): Int = {
    require(retainLast >= 2,
      "retainLast must be >= 2: an at-least-once replay of the tip " +
        "batch folds from the label dir below it; retaining only the " +
        "tip would break replay idempotence in the crash window")
    val stale = labelBatches(outPath).dropRight(retainLast)
    val store = graft.operators.LogStore.forPath(outPath)
    stale.foreach(b => store.deleteTree(s"$outPath/labels/b$b"))
    stale.size
  }

  private[graft] def applyClusterLabelsBatch(batch: DataFrame, batchId: Long,
      content: String, id: String, outPath: String,
      k: Int, numHashes: Int, bands: Int, threshold: Double): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val ss = batch.sparkSession
    import graft.operators.Dedup
    val sigs = Dedup.minhashSignatures(batch, col(content), col(id),
      k, numHashes).persist()
    try {
      val bandedB = Dedup.bandFrame(sigs, bands, rows)
      val sigsDir = s"$outPath/store/sigs"
      val bandsDir = s"$outPath/store/bands"
      val est = graft.functions.VectorExprs
        .longVecEqCount(col("sig_a"), col("sig_b")).cast("double") / numHashes
      val crossPairs =
        if (graft.operators.LogStore.forPath(bandsDir).exists(bandsDir)) {
          val storeBands = ss.read.parquet(bandsDir)
            .filter(col("batch_id") < batchId)
            .select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
            .dropDuplicates("doc_b", "band")
          val storeSigs = ss.read.parquet(sigsDir)
            .filter(col("batch_id") < batchId)
            .select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
            .dropDuplicates("doc_b")
          bandedB
            .select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
              col("band"), col("band_hash"))
            .join(storeBands, Seq("band", "band_hash"))
            .select("doc_a", "sig_a", "doc_b").distinct()
            .join(storeSigs, "doc_b")
            .filter(est >= threshold && col("doc_a") =!= col("doc_b"))
            .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
              greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        } else sigs.select(col("doc_id").as("doc_a"),
          col("doc_id").as("doc_b")).limit(0)
      val localPairs = bandedB.as("a").join(bandedB.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("a.sig").as("sig_a"),
          col("b.doc_id").as("doc_b"), col("b.sig").as("sig_b"))
        .distinct()
        .filter(est >= threshold)
        .select("doc_a", "doc_b")
      val pairs = crossPairs.unionByName(localPairs).distinct().persist()
      val prev = labelBatches(outPath).filter(_ < batchId).lastOption
      val labels = prev match {
        case Some(b) => Dedup.duplicateClustersIncremental(
          ss.read.parquet(s"$outPath/labels/b$b"), pairs)
        case None => Dedup.duplicateClusters(pairs)
      }
      labels.coalesce(1).write.mode("overwrite")
        .parquet(s"$outPath/labels/b$batchId")
      sigs.withColumn("batch_id", lit(batchId))
        .coalesce(1).write.mode("append").parquet(sigsDir)
      Dedup.bandFrame(sigs, bands, rows).drop("sig")
        .withColumn("batch_id", lit(batchId))
        .coalesce(1).write.mode("append").parquet(bandsDir)
      pairs.unpersist()
      ()
    } finally { sigs.unpersist(); () }
  }

  def cmsTopHotKeys(spark: SparkSession, outPath: String, k: Int): DataFrame = {
    val merged = spark.read.parquet(s"$outPath/sketches")
      .groupBy("batch_id").agg(first(col("sketch")).as("sketch"))
      .agg(graft.functions.CmsExprs.cmsUnion(col("sketch")).as("sk"))
    val heapDir = s"$outPath/heap"
    val heapKeys =
      if (graft.operators.LogStore.forPath(heapDir).exists(heapDir))
        Seq(spark.read.parquet(heapDir).select(col("k")))
      else Nil
    val cands = heapKeys
      .foldLeft(spark.read.parquet(s"$outPath/candidates").select(col("k")))(
        _ unionByName _)
      .distinct()
    // 1-row sketch frame broadcast against the (small) candidate set
    cands.crossJoin(broadcast(merged))
      .select(col("k"),
        graft.functions.CmsExprs.cmsEstimate(col("sk"), col("k")).as("est_n"))
      .orderBy(col("est_n").desc, col("k"))
      .limit(k)
  }

  /**
   * FOLLOW a [[graft.operators.Snapshot]] table's commit log as a
   * stream — CDC OUT, the read-side twin of [[cdcSnapshotSink]]'s CDC
   * in. The `_log/` directory is append-only (one immutable manifest
   * per version, atomically renamed in), which is exactly the
   * contract Spark's file stream source is built for: the source
   * discovers new `vNNNNNNNN.json` files, the checkpoint records
   * which are consumed, and `apply(version, op, removedRows,
   * addedRows)` runs once per commit in version order with the
   * [[graft.operators.Snapshot.changeSet]] of that commit — work
   * bounded by the commit's copy-on-write footprint, never the table.
   * Restart resumes from the checkpoint; `apply` should additionally
   * be idempotent PER VERSION (ledger on the version number, as
   * [[incrementalViewSink]] does) so a batch replayed across a crash
   * converges. Vacuum retention on the followed table must exceed
   * follower lag (changeSet needs the parent manifest).
   */
  def snapshotFollowSink(spark: SparkSession, table: String,
                         checkpoint: String)
                        (apply: (Int, String, DataFrame, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val manifests = spark.readStream
      .option("wholetext", "true") // one row per manifest file
      .text(s"$table/_log/v*.json")
      .select(input_file_name().as("file"))
    manifests.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vs = batch.select("file").collect()
          .map(_.getString(0))
          .map(f => f.substring(f.lastIndexOf("/v") + 2, f.lastIndexOf(".json")).toInt)
          .sorted
        vs.foreach { v =>
          val op = graft.operators.Snapshot.readManifest(table, v).op
          val (removed, added) =
            graft.operators.Snapshot.changeSet(batch.sparkSession, table, v)
          apply(v, op, removed, added)
        }
      }
  }

  /**
   * STREAMING MATERIALIZED VIEW: keep an [[IncrementalAgg]]-shaped
   * grouped-aggregate table current by FOLLOWING a snapshot table's
   * commit log — the full incremental lakehouse loop closed:
   * [[cdcSnapshotSink]] lands change batches as atomic versions, this
   * sink tails the version log and applies each commit's
   * [[graft.operators.Snapshot.changeSet]] to the downstream
   * aggregate as delta-sized work. A 2% refresh updates the
   * KB-sized view at the cost of the 2%, never a table rescan.
   *
   * Exactly-once twice over: the file-source checkpoint consumes each
   * manifest once, and [[IncrementalAgg.maintainBatch]]'s ledger is
   * keyed on the VERSION number — deterministic across restarts,
   * checkpoint loss, or a second follower, so re-delivery is a no-op
   * (the window [[IncrementalAgg.maintainBatch]] documents). Pure
   * layout commits (`compact`) are skipped by op — their change sets
   * net to zero by contract; applying them would only cost.
   */
  def incrementalViewSink(spark: SparkSession, table: String,
                          checkpoint: String, aggPath: String,
                          groupCols: Seq[String], sumCols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    snapshotFollowSink(spark, table, checkpoint) { (v, op, removed, added) =>
      if (op != "compact") {
        if (!graft.operators.LogStore.forPath(aggPath).exists(aggPath)) // bootstrap: empty view
          graft.operators.IncrementalAgg.build(added.limit(0), groupCols, sumCols)
            .write.parquet(aggPath)
        graft.operators.IncrementalAgg.maintainBatch(added.sparkSession,
          aggPath, v.toLong, groupCols, sumCols, removed, added)
        ()
      }
    }
}
