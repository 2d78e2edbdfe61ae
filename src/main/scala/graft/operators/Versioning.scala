package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus VERSION DELTA — classify every document across two corpus
 * snapshots as `added` / `removed` / `updated` / `unchanged` by id +
 * content hash. Training corpora are refreshed, not rebuilt: a new
 * crawl lands, some pages changed, most didn't. The delta is what
 * downstream incremental operators consume (re-embed only `added`+
 * `updated`, retire `removed` from the index, leave the 95%
 * `unchanged` untouched) — without it every refresh reprocesses the
 * full 100 TB.
 *
 * Implementation: documents travel as (id, md5(content)) — a 32-byte
 * key instead of the document body — through ONE full outer join on
 * id. At scale that join is a well-distributed hash shuffle on a
 * unique key (no skew by construction); both inputs prune to two
 * columns at the scan. Status is a pure projection on match/hash
 * equality.
 */
object Versioning {

  /**
   * Delta between `old` and `neu` snapshots: returns (doc_id, status,
   * old_hash, new_hash) for every id in either snapshot, with status
   * ∈ added | removed | updated | unchanged. Ids must be unique
   * within each snapshot (corpus invariant; enforce upstream with
   * [[Dedup.exact]]).
   */
  def delta(old: DataFrame, neu: DataFrame,
            oldId: Column, oldContent: Column,
            newId: Column, newContent: Column): DataFrame = {
    val o = old.select(oldId.as("doc_id"), md5(oldContent).as("old_hash"))
    val n = neu.select(newId.as("doc_id"), md5(newContent).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("updated")))
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
  }

  /**
   * SLOWLY-CHANGING-DIMENSION (type 2) builder: from an event/change
   * stream `(key, ts, attr)`, materialize the attribute's VERSION
   * HISTORY — one row per value run with `valid_from` / `valid_to`
   * effective ranges, `is_current` on the open version and a per-key
   * `version` ordinal. Consecutive re-deliveries of the SAME value do
   * not open a new version (true SCD2 change semantics, null-safe);
   * `tieBreak` makes same-timestamp order deterministic.
   *
   * The warehouse staple the reference's append/overwrite sinks
   * cannot express: "what was this customer's plan on March 3rd" is
   * one `BETWEEN valid_from AND valid_to` lookup, and the builder is
   * the read-side complement of the snapshot table's time travel
   * (that versions the TABLE; this versions each ENTITY's attribute).
   *
   * Scale: two window passes over the SAME (key, ts, tie) sort —
   * Catalyst reuses the exchange and sort, so the whole history is
   * ONE shuffle of (key, ts, tie, attr), never the payload.
   */
  def scd2(df: DataFrame, key: Column, ts: Column, attr: Column,
           tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(key.as("key"), ts.as("ts"),
      tieBreak.as("tie"), attr.as("attr"))
    val w = Window.partitionBy("key").orderBy(col("ts"), col("tie"))
    val changes = base
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("__prev") <=> col("attr")))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("int"))
      .select(col("key"), col("attr"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"))
  }

  /**
   * INCREMENTAL [[scd2]] maintenance: apply a batch of NEW events to
   * an existing history — only keys present in the batch are touched
   * (their open version replays as a pseudo-event together with the
   * new events; closed versions and untouched keys carry forward
   * verbatim), so the work is DELTA-sized: at 100 TB the nightly
   * update costs |batch| + one row per affected key, never the
   * dimension. The result is EXACTLY `scd2(allEventsEverSeen)` —
   * spec-asserted and oracle-gated against the one-shot recompute.
   *
   * Contract: append-only event time — a batch event must not predate
   * an affected key's current `valid_from` (late events need the
   * one-shot rebuild; SCD2 stores only run starts, so the history to
   * splice into is no longer materialized).
   *
   * `existing` must have [[scd2]]'s output schema; `tieFloor` is a
   * tie value sorting BEFORE any real event at the same timestamp
   * (the pseudo-event must stay the run's opener). When omitted it is
   * derived from the tie column's ACTUAL type minimum — casting a
   * fixed Long.MinValue would wrap (non-ANSI) to 0 for an Int tie
   * column and silently let a same-timestamp batch event with tie<=0
   * sort before the replayed open version. Non-numeric tie types have
   * no derivable floor: pass one explicitly.
   */
  def scd2Apply(existing: DataFrame, events: DataFrame, key: Column,
                ts: Column, attr: Column, tieBreak: Column,
                tieFloor: Column = null): DataFrame = {
    val ev = events.select(key.as("key"), ts.as("ts"),
      tieBreak.as("tie"), attr.as("attr"))
    val floor = Option(tieFloor).getOrElse {
      import org.apache.spark.sql.types._
      ev.schema("tie").dataType match {
        case LongType    => lit(Long.MinValue)
        case IntegerType => lit(Int.MinValue)
        case ShortType   => lit(Short.MinValue)
        case ByteType    => lit(Byte.MinValue)
        case DoubleType  => lit(Double.NegativeInfinity)
        case FloatType   => lit(Float.NegativeInfinity)
        case dt => throw new IllegalArgumentException(
          s"scd2Apply: no derivable tie floor for type $dt — pass tieFloor explicitly")
      }
    }
    val affected = ev.select("key").distinct()
    val untouched = existing.join(affected, Seq("key"), "left_anti")
    val touched = existing.join(affected, Seq("key"), "left_semi")
    val closed = touched.filter(!col("is_current"))
    val open = touched.filter(col("is_current"))
    // replay = each affected key's open version as a pseudo-event
    // (tieFloor keeps it first within its own timestamp) + the batch
    val replay = open
      .select(col("key"), col("valid_from").as("ts"),
        floor.cast(ev.schema("tie").dataType).as("tie"), col("attr"))
      .unionByName(ev)
    val rebuilt = scd2(replay, col("key"), col("ts"), col("attr"), col("tie"))
    // version numbering continues where the closed history left off
    val offsets = open.select(col("key"), (col("version") - 1).as("__off"))
    val renumbered = rebuilt.join(offsets, Seq("key"), "left")
      .withColumn("version",
        (col("version") + coalesce(col("__off"), lit(0))).cast("int"))
      .drop("__off")
    untouched.unionByName(closed).unionByName(renumbered)
  }
}
