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

  /**
   * PER-GROUP DOCUMENT CAP: keep at most `maxN` rows of each group,
   * chosen by deterministic hash order (the "no more than N pages per
   * domain" rule every web-corpus pipeline applies so one giant site
   * cannot dominate training). The hash order makes the kept subset a
   * uniform sample of the group that is stable across runs, engines
   * and partitionings — no RNG, no first-N-in-file bias.
   *
   * Scale: one shuffle keyed by the group for the per-group
   * row_number. A pathologically heavy group concentrates its sort in
   * one task; AQE skew handling splits the sort spill, and because the
   * emitted rank only has to be correct UP TO maxN, a pre-filter on
   * `hashBucket10k(id) < ~(maxN/est_group_size)·10⁴·slack` can shrink
   * a giant group before the window when maxN ≪ group size.
   *
   * Output: the input columns + `grp_rank` (1-based hash-order rank
   * within the group, ≤ maxN).
   */
  def capPerGroup(df: DataFrame, group: Column, id: Column,
                  maxN: Int): DataFrame = {
    require(maxN > 0, "maxN must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(md5(id.cast("string")), id)
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .filter(col("grp_rank") <= maxN)
  }

  /**
   * CLUSTER-BALANCED selection (the DataComp/DCLM corpus-shaping
   * move): assign each document's embedding to its nearest pinned
   * centroid, then apply [[capPerGroup]] PER CLUSTER — "no more than
   * N documents per topic", the embedding-space analog of the
   * per-domain cap (#81). Where sqrt-temperature mixing (#71)
   * rebalances by a DECLARED group (language, source), this
   * rebalances by the corpus' own LATENT structure: over-represented
   * topics (boilerplate clusters, SEO farms) are cut to the cap while
   * the long tail survives whole.
   *
   * Determinism: the codebook is PINNED (caller-supplied, e.g. the
   * first-k anchor codebook IVF training seeds from), assignment
   * breaks distance ties by lowest centroid index, and the within-
   * cluster order is the md5 hash order — bit-stable across runs,
   * engines and partitionings, so the kept subset is reproducible and
   * SQL-replayable.
   *
   * Scale: assignment is one scan-side codegen'd kernel (no shuffle);
   * the cap is one shuffle keyed by cell — k cells bound the window
   * width, and the emitted rank only has to be correct up to maxN.
   *
   * Output: `(id, cell, cell_rank)` for the kept rows.
   */
  def clusterBalancedCap(df: DataFrame, id: Column, vec: Column,
                         centroids: Array[Array[Double]],
                         maxN: Int): DataFrame = {
    require(centroids.nonEmpty, "clusterBalancedCap: empty codebook")
    import graft.functions.VectorExprs.nearestCentroids
    // a null/absent embedding has no topic: dropped, not grouped
    val assigned = df.select(id.as("id"),
      element_at(nearestCentroids(vec, centroids, 1), 1).as("cell"))
      .filter(col("cell").isNotNull)
    capPerGroup(assigned, col("cell"), col("id"), maxN)
      .select(col("id"), col("cell"), col("grp_rank").as("cell_rank"))
  }

  /**
   * QUANTILE QUALITY GATE: keep rows whose metric reaches their
   * group's exact `q`-quantile — "drop the worst quarter of each
   * source by quality score", the relative-threshold filtering step
   * that absolute cutoffs can't express when sources have different
   * score distributions.
   *
   * Determinism: Spark's exact `percentile` and DuckDB's
   * `quantile_cont` share the same linear-interpolation definition,
   * so the threshold is cross-engine identical (validated by the
   * field_quantiles oracle).
   *
   * Scale: thresholds are one aggregation over (group) — one row per
   * group, broadcast back into a map-side filter, so the corpus
   * itself is never shuffled. The hint assumes the group count is
   * broadcastable (languages, sources: yes; millions of web domains:
   * pass `hintBroadcast = false` and let Spark pick the join). Exact
   * per-group percentile sorts each group's metric vector inside the
   * aggregation buffer; for groups too large for that, swap
   * `percentile` for `approx_percentile` at the call site (same plan
   * shape, bounded memory).
   *
   * Rows with a null group cannot match the threshold join and are
   * dropped (same as their absence from any per-group threshold).
   *
   * Output: input columns + `threshold` (the group's quantile value).
   */
  def quantileGate(df: DataFrame, group: Column, metric: Column,
                   q: Double, hintBroadcast: Boolean = true): DataFrame = {
    require(q >= 0 && q <= 1, "q must be in [0, 1]")
    val thr = df.groupBy(group.as("__grp"))
      .agg(percentile(metric, lit(q)).as("threshold"))
    val side = if (hintBroadcast) broadcast(thr) else thr
    df.join(side, group === col("__grp"))
      .filter(metric.cast("double") >= col("threshold"))
      .drop("__grp")
  }

  /**
   * EPOCH UPSAMPLING: repeat each row `weight` times, tagged with a
   * 1-based `epoch` index — the materialized form of per-source epoch
   * counts ("2 epochs of books, 1 of web") that data-mixture recipes
   * prescribe. Materializing the repeats keeps downstream packing /
   * shuffling / splitting uniform: they see one stream of rows.
   *
   * Scale: a pure map-side explode — no shuffle, no state; output
   * size is Σ weights, exactly the token-budget math the mixture
   * recipe already did. Weight 0 or null drops the row (a mixture
   * weight of zero IS a filter, and a left-join miss means "not in
   * the recipe"); negative weights are rejected at runtime.
   */
  def upsampleEpochs(df: DataFrame, weight: Column): DataFrame = {
    val w = weight.cast("int")
    // sequence(1, 0) yields [1, 0] (Spark picks step -1 when start >
    // stop), so weight 0/null must be an explicit empty array;
    // negatives fail loudly instead of silently exploding a
    // descending range
    val epochs = when(w >= 1, sequence(lit(1), w))
      .when(w === 0 || w.isNull, array().cast("array<int>"))
      .otherwise(raise_error(lit("upsampleEpochs: negative weight")).cast("array<int>"))
    // explode must be a top-level select item (not nested in a cast)
    df.select(col("*"), explode(epochs).as("__e"))
      .withColumn("epoch", col("__e").cast("long")).drop("__e")
  }

  /**
   * PER-GROUP TOKEN BUDGET: keep each group's hash-order prefix whose
   * cumulative token count stays within `budget` — the mixture
   * MATERIALIZATION primitive ("exactly 10 B tokens of web, 2 B of
   * code") where [[capPerGroup]] counts documents, this counts
   * tokens. Hash order makes the kept prefix a uniform, run-stable
   * sample of the group.
   *
   * Scale: one shuffle keyed by the group for the running sum; the
   * window is the same per-group sort [[capPerGroup]] pays. Output:
   * input columns + `tok_cumsum` (inclusive running total, ≤ budget).
   */
  def tokenBudgetPerGroup(df: DataFrame, group: Column, id: Column,
                          tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(md5(id.cast("string")), id)
    df.withColumn("tok_cumsum", sum(tokens.cast("long")).over(w))
      .filter(col("tok_cumsum") <= budget)
  }

  /**
   * DETERMINISTIC GLOBAL TRAINING ORDER: a seeded, engine-stable
   * permutation of the corpus — `order_id` is the exact global rank of
   * md5(seed ‖ id). Training-data order matters (curriculum, shard
   * assignment, resumable loaders) and `orderBy(rand())` is none of
   * reproducible, partitioning-stable, or engine-portable; a keyed
   * hash rank is all three.
   *
   * Scale: the global rank is computed WITHOUT a single-reducer sort:
   * rows bucket by the key's first byte (256 buckets), per-bucket
   * counts (a 256-row frame) turn into cumulative offsets on the
   * driver-free broadcast side, and each bucket ranks internally in
   * parallel — `order_id = offset(bucket) + rank_within_bucket`. Two
   * narrow shuffles (256-key bucket partition + the tiny counts agg),
   * no global exchange of the corpus beyond the bucketing itself.
   *
   * A null id hashes to a null key and is dropped BEFORE bucketing,
   * so null-id rows are absent from the output and the emitted ranks
   * remain a dense 1..n permutation of the non-null rows (coalesce a
   * surrogate id upstream if nulls must be ranked). Ids are assumed
   * UNIQUE: duplicate ids (e.g. an [[upsampleEpochs]] output) tie on
   * the full sort key and their relative order is then
   * partitioning-dependent — rank a composite id
   * (`concat(id, '#', epoch)`) instead.
   */
  def globalOrder(df: DataFrame, id: Column, seed: String): DataFrame = {
    val keyed = df.withColumn("__k",
        md5(concat(lit(seed), id.cast("string"))))
      // a null key would form its own bucket and inflate every real
      // bucket's cumulative offset (nulls sort first) — drop it here
      // so order_id stays a dense 1..n permutation
      .filter(col("__k").isNotNull)
      .withColumn("__b", substring(col("__k"), 1, 2))
    val offsets = keyed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b").as("__ob"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__k"), id)
    keyed.join(broadcast(offsets), col("__b") === col("__ob"))
      .withColumn("order_id", (col("__off") + row_number().over(w)).cast("long"))
      .drop("__k", "__b", "__ob", "__off")
  }

  /**
   * EXACT-N DETERMINISTIC SAMPLE: precisely `n` rows (fewer only if
   * the corpus is smaller), chosen as the first `n` of the seeded
   * [[globalOrder]] permutation — "give me exactly 100 k documents"
   * without the ±√n wobble of fraction sampling or the
   * partitioning-dependence of `limit`. Same two narrow shuffles as
   * the underlying global rank; the emitted `order_id` (1..n) doubles
   * as a stable position within the sample. Inherits [[globalOrder]]'s
   * contract: unique non-null ids.
   */
  def takeExactly(df: DataFrame, id: Column, n: Long, seed: String): DataFrame = {
    require(n > 0, "n must be positive")
    globalOrder(df, id, seed).filter(col("order_id") <= n)
  }

  /**
   * EXPORT SHARDING — assign every row a (shard_id, pos_in_shard)
   * under the seeded [[globalOrder]] permutation, `docsPerShard` rows
   * per shard: the WebDataset/tfrecord materialization step where
   * training data becomes numbered shards that loaders stream and
   * resume by offset. Deterministic (same seed → same shards on any
   * cluster), shards are dense 0..⌈n/docsPerShard⌉−1, and writing is
   * `partitionBy("shard_id")` on the result. Same two narrow
   * shuffles as the underlying global rank.
   */
  def exportShards(df: DataFrame, id: Column, seed: String,
                   docsPerShard: Int): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    globalOrder(df, id, seed)
      .withColumn("shard_id",
        floor((col("order_id") - 1) / docsPerShard).cast("long"))
      .withColumn("pos_in_shard",
        ((col("order_id") - 1) % docsPerShard).cast("long"))
  }

  /** Shard MANIFEST for an [[exportShards]] assignment: row count +
    * order range per shard — what a training loader checks before
    * streaming, and the completeness audit after a distributed
    * write (every shard full except possibly the last). */
  def shardManifest(shards: DataFrame): DataFrame =
    shards.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("order_id")).as("first_order"),
        max(col("order_id")).as("last_order"))

  /**
   * WEIGHTED RESERVOIR SAMPLE (Efraimidis–Spirakis A-ES): exactly `n`
   * rows drawn WITHOUT replacement with inclusion probability
   * proportional to `weight` — "sample 100k documents, long documents
   * proportionally more often" (token-weighted corpus subsampling,
   * importance-weighted eval slices). Each row gets the A-ES key
   * u^(1/w) with u derived deterministically from md5(seed, id)
   * (13 hex chars = 52 bits, exactly representable in a double, so
   * the same seed reproduces the same sample on any cluster or
   * engine); the sample is the global top-n by key.
   *
   * Scale: top-n is `orderBy(key).limit(n)` — Spark plans
   * TakeOrderedAndProject: a per-partition heap of n, then one
   * n-sized merge at the driver-side of the final stage. No full
   * sort, no full shuffle; the corpus is scanned once.
   * Contract: unique non-null ids, strictly positive weights.
   */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     n: Long, seed: String): DataFrame = {
    require(n > 0 && n <= Int.MaxValue, "n must be in (0, Int.MaxValue]")
    // zero/negative weights have zero inclusion probability under
    // A-ES; without this filter w<0 would give keys u^(negative) > 1
    // that deterministically OUTRANK every valid row — a silently
    // inverted sample if the weight column carries bad rows
    df.filter(weight.cast("double") > 0.0)
      .withColumn("__aes", aesKey(id, weight, seed))
      .orderBy(col("__aes").desc, id)
      .limit(n.toInt)
      .drop("__aes")
  }

  /** The A-ES sampling key u^(1/w): u from 13 md5 hex chars (52 bits,
    * exactly double-representable — cross-engine reproducible). */
  private def aesKey(id: Column, weight: Column, seed: String): Column = {
    val u = (conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 1.0) / math.pow(16, 13)
    pow(u, lit(1.0) / weight.cast("double"))
  }

  /**
   * PER-GROUP weighted sample: `nPerGroup` rows from EACH group,
   * inclusion ∝ weight within the group — the weighted counterpart of
   * [[capPerGroup]] ("keep 1000 pages per domain, longer pages more
   * often"). Same A-ES keys, ranked by a group-partitioned window —
   * one hash shuffle on the group key, no global sort, no hot task
   * unless one group dominates the corpus (then cap or salt upstream;
   * [[StatsOp.keyHistogram]] diagnoses it).
   */
  def weightedSamplePerGroup(df: DataFrame, group: Column, id: Column,
                             weight: Column, nPerGroup: Int,
                             seed: String): DataFrame = {
    require(nPerGroup > 0, "nPerGroup must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("__aes").desc, id)
    df.filter(weight.cast("double") > 0.0) // see weightedSample
      .withColumn("__aes", aesKey(id, weight, seed))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= nPerGroup)
      .drop("__aes")
  }
}
