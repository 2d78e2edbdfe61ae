package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-GRAM LANGUAGE-MODEL QUALITY SCORING — the CCNet construction
 * (Wenzek et al. '19): score every document by how well a reference
 * language model predicts it, then filter/bucket on the score. CCNet
 * uses a KenLM 5-gram; graft implements the same shape with an
 * add-alpha-smoothed bigram model trained ON a reference corpus slice
 * — the model is exact count arithmetic, so scores are deterministic
 * and cross-engine reproducible (DuckDB oracle), and the construction
 * (train counts → broadcast-join → per-doc aggregate) is the one a
 * real KenLM-scale model would use on a cluster.
 *
 * Scale shape: training is one map-side-combined count aggregation
 * over the reference slice (shuffles (token-pair, partial-count),
 * never text). Scoring explodes each document into its bigram
 * instances MAP-SIDE, joins the model — a count-aggregate output
 * whose runtime size AQE sees, so a small model becomes a broadcast
 * join automatically; a huge one falls back to a hash join on the
 * bigram key — and reduces to one row per document with map-side
 * partial aggregation. Nothing in the plan is quadratic; the only
 * wide exchanges carry hashed keys and counts.
 *
 * P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V), V = distinct unigrams.
 * bits/token = −Σ log2 P over the doc's bigrams / #bigrams;
 * perplexity = 2^(bits/token). Unseen bigrams/unigrams fall back to
 * the α floor — the OOV penalty.
 */
object LanguageModel {

  /** Whitespace tokens of the trimmed lowercased text (empty → []). */
  def tokens(c: Column): Column =
    when(length(trim(lower(c))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(c)), "\\s+"))

  /** (word, cnt) unigram counts over a reference corpus. */
  def unigramCounts(corpus: DataFrame, content: Column): DataFrame =
    corpus.select(explode(tokens(content)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** (w1, w2, cnt) bigram counts; `minCount` prunes the tail (hapax
    * bigrams are most of a crawl's model and contribute only the
    * smoothing floor anyway). */
  def bigramCounts(corpus: DataFrame, content: Column,
                   minCount: Long = 1L): DataFrame = {
    val t = tokens(content)
    corpus.select(explode(arrays_zip(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /**
   * Score `docs` against a trained (unigrams, bigrams) model:
   * (id, n_bigrams, bits_per_token, ppl), rounded at 6 dp. Documents
   * with fewer than 2 tokens keep a row with nulls (no distribution
   * to score — dropping them silently would unalign pipelines).
   */
  def perplexity(docs: DataFrame, id: Column, content: Column,
                 unigrams: DataFrame, bigrams: DataFrame,
                 alpha: Double = 0.5): DataFrame = {
    val t = tokens(content)
    val base = docs.select(id.as("id"))
    val pairs = docs.select(id.as("id"), explode(arrays_zip(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))))).as("p"))
      .select(col("id"), col("p.0").as("w1"), col("p.1").as("w2"))
    // V as a broadcast 1-row frame: keeps the plan lazy (no count()
    // action) and the literal exact
    val v = unigrams.agg(count(lit(1)).cast("double").as("__v"))
    val scored = pairs
      .join(bigrams.withColumnRenamed("cnt", "__bc"), Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("word", "w1")
        .withColumnRenamed("cnt", "__uc"), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__lp",
        log((coalesce(col("__bc"), lit(0L)).cast("double") + lit(alpha)) /
          (coalesce(col("__uc"), lit(0L)).cast("double") + lit(alpha) * col("__v"))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .withColumn("bits_per_token",
        round((lit(0.0) - col("__slp")) / (col("n_bigrams") * lit(math.log(2.0))), 6))
      .withColumn("ppl",
        round(pow(lit(2.0),
          (lit(0.0) - col("__slp")) / (col("n_bigrams") * lit(math.log(2.0)))), 6))
      .select(col("id"), col("n_bigrams"), col("bits_per_token"), col("ppl"))
    base.join(scored, Seq("id"), "left")
  }
}
