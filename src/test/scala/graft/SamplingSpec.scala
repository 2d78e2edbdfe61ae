package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("stratifiedSample: per-stratum fractions, deterministic, no shuffle") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .withColumn("stratum", (col("doc_id") % 2 === 0).cast("string"))
    val out = Sampling.stratifiedSample(df, col("stratum"), col("doc_id"),
      Map("true" -> 0.3))
    val total = df.filter(col("stratum") === "true").count().toDouble
    val kept = out.filter(col("stratum") === "true").count().toDouble
    assert(math.abs(kept / total - 0.3) < 0.1, s"kept $kept of $total")
    // unlisted stratum keeps the default fraction (1.0 → everything)
    assert(out.filter(col("stratum") === "false").count() ===
      df.filter(col("stratum") === "false").count())
    // keep-set is a pure function of the id — identical after repartition
    val again = Sampling.stratifiedSample(df.repartition(7), col("stratum"),
        col("doc_id"), Map("true" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
    // map-side only: no exchange in the sampling plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "stratified sampling must not shuffle")
  }

  test("packSequences: seq assignment equals the exclusive-cumsum formula") {
    val d = Seq((1L, 100L), (2L, 2000L), (3L, 30L), (4L, 500L), (5L, 1500L), (6L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packSequences(d, lit(0), col("doc_id"), col("n_tokens"),
        budget = 1024)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    // exclusive cumsums: 0, 100, 2100, 2130, 2630, 4130 → /1024 floor
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 4L))
  }

  test("packSequences: shards pack independently and conserve documents") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"),
        TextAnalysisCols.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val out = Sampling.packSequences(d, Sampling.hashBucket(col("doc_id")) % 4,
      col("doc_id"), col("n_tokens"), budget = 2048)
    assert(out.count() === d.count())
    // per (shard, seq) sums: every non-final sequence of a shard holds
    // at least one full budget of started tokens
    val seqs = out.groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("toks"))
      .select("shard", "seq_id", "toks").as[(Long, Long, Long)].collect()
    assert(seqs.map(_._1).distinct.length === 4)
    assert(seqs.forall(_._3 > 0))
  }

  test("decontaminate drops benchmark matches incl. token-permuted paraphrases") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "fox brown quick the"), // permutation of the benchmark doc
      (3L, "completely different text")).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox").toDF("text")
    val out = Dedup.decontaminate(corpus, col("text"), bench, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(3L))
    // benchmark side is broadcast: no shuffle of the corpus
    val plan = Dedup.decontaminate(corpus, col("text"), bench, col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast anti join:\n$plan")
  }
}
