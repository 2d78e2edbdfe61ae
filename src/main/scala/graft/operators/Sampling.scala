package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting for training pipelines.
 *
 * `randomSplit` is seed- and partitioning-dependent: re-running on a
 * repartitioned input reassigns rows. A hash split is a pure function
 * of the record id — stable under re-partitioning, re-runs, backfills
 * and engine changes (md5 is everywhere), which is what training/eval
 * hygiene actually requires: a document must never migrate from test
 * into train between pipeline versions.
 */
object Sampling {

  /** Stable bucket in [0, buckets) from the id's md5 — the ONE bucket
    * formula every sampler/splitter shares (the DuckDB oracles encode
    * it verbatim; keep them in sync). */
  def hashBucket(id: Column, buckets: Int): Column =
    (conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % buckets)

  /** Stable percentage bucket in [0, 100). */
  def hashBucket(id: Column): Column = hashBucket(id, 100)

  /**
   * Assign train/val/test by hash bucket: [0, trainPct) → train,
   * [trainPct, trainPct+valPct) → val, rest → test.
   */
  def hashSplit(df: DataFrame, id: Column,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(id)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Stable fine-grained bucket in [0, 10000) — resolution for
    * sub-percent sampling fractions. */
  def hashBucket10k(id: Column): Column = hashBucket(id, 10000)

  /**
   * Deterministic STRATIFIED sampling: keep each row with its
   * stratum's fraction, decided by the id hash — rebalancing
   * over-represented strata (the standard language/domain/source
   * mixing step of a training-data pipeline). Pure map-side filter:
   * no shuffle, no RNG state, identical keep-set on every run,
   * engine and partitioning independent. Fractions are interpreted
   * at 1/10000 resolution; strata absent from `fractions` keep
   * `defaultFraction`.
   */
  def stratifiedSample(df: DataFrame, strata: Column,
                       id: Column, fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) => when(strata === stratum, lit(f)).otherwise(acc)
    }
    // null ids hash to a null bucket, which would fail the comparison
    // and silently drop the row even at fraction 1.0 — pin them to
    // bucket 0 (always kept unless the stratum's fraction is 0)
    df.filter(coalesce(hashBucket10k(id), lit(0L)) < frac * 10000)
  }

  /**
   * SQUARE-ROOT TEMPERATURE corpus mixing (τ = 0.5): downsample each
   * stratum so the kept distribution is proportional to √p_s — the
   * standard multilingual/multi-source rebalancing exponent (flattens
   * dominant strata without drowning rare ones). Derivation: target
   * share q_s ∝ √p_s achieved by downsampling only ⇒ keep fraction
   * f_s = √(n_min / n_s) (the rarest stratum is kept whole; the
   * normalizer cancels). Kept size per stratum is √(n_s·n_min).
   *
   * Determinism: n_min/n_s is an IEEE-exact double division and
   * `sqrt` is correctly rounded by IEEE-754 in every engine (unlike
   * `pow`, which is why the operator pins τ = 0.5 instead of taking a
   * free exponent) — so the keep decision `bucket < f_s·10⁴` is
   * bit-identical across engines, and the same hash-bucket discipline
   * as [[stratifiedSample]] makes it partitioning- and run-stable.
   *
   * Scale: one aggregation for stratum counts (tiny frame), broadcast
   * back, map-side filter — the corpus is never shuffled.
   */
  def sqrtTemperatureMix(df: DataFrame, strata: Column, id: Column): DataFrame = {
    val counts = df.groupBy(strata.as("__stratum"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val minN = counts.agg(min(col("__n")).as("__n_min"))
    val frac = sqrt(col("__n_min") / col("__n"))
    df.join(broadcast(counts), strata === col("__stratum"))
      .crossJoin(broadcast(minN))
      .filter(coalesce(hashBucket10k(id), lit(0L)) < frac * 10000)
      .drop("__stratum", "__n", "__n_min")
  }

  /**
   * Token-budget SEQUENCE PACKING: assign each document to the
   * training sequence (of `budget` tokens, concatenated corpus order)
   * in which it starts — `seq_id = floor(exclusive_cumsum(tokens) /
   * budget)` over the (shard, id) order. The packing view of a token
   * stream cut every `budget` tokens; deterministic given the order.
   *
   * Scale: a GLOBAL order is a single-reducer window, so packing is
   * per-`shard` (partitionBy(shard).orderBy(id)) — shards pack
   * independently and in parallel, which is how packing actually runs
   * on a cluster (each worker packs its shard of the corpus). Pass a
   * hash-derived shard (e.g. [[hashBucket]] % nShards) for balanced
   * shards.
   */
  def packSequences(df: DataFrame, shard: Column, id: Column,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(id)
    val tok = tokens.cast("long")
    df.withColumn("shard", shard)
      .withColumn("seq_id",
        floor((sum(tok).over(w) - tok) / budget).cast("long"))
  }
}
