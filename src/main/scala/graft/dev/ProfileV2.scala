package graft.dev

import graft.TextAnalysisCols
import graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of pipeline_docs_v2 (dev tool:
  * attributes the composed pipeline's cost to its stages so
  * composition regressions are diagnosable — VERDICT r4 #1). */
object ProfileV2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // graft's bounded-heap top-k agg (TopKExprs) keeps one k-sized
      // buffer per query id; the 128-group default would push it into
      // sort-based fallback (re-sorting the candidate frame — the
      // exact spill this agg exists to remove). Catalog sketch aggs
      // (HLL/CMS/DDSketch) only ever group by low-cardinality keys,
      // so the raised cap never bites them.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm: parquet footers + codegen
    noop(docs.select(count(lit(1))))

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val freq = time("shingleFrequencies") {
        graft.operators.Dedup.shingleFrequencies(docs, col("text"), col("doc_id"))
      }
      val scored = docs.select(
        (col("doc_id") +: TextAnalysisCols.qualityFeatures(col("text"))) :+
          TextAnalysisCols.langId(col("text")).as("lang_pred") :+ col("text"): _*)
      val filtered = scored
        .filter(col("lang_pred") === "en" && col("quality_score") >= 0.51)
      val kept = operators.OpCache.cache(
        filtered
          .groupBy(md5(col("text")).as("__fp"))
          .agg(min_by(struct(col("doc_id"), col("text"), col("n_tokens")),
            col("doc_id")).as("__r"))
          .select(col("__r.doc_id"), col("__r.text"), col("__r.n_tokens")))
      time("kept materialize")(noop(kept))
      // r8: the shipped pipeline routes cluster dedup through banded
      // LSH (Dedup.nearDupClusters) — profile that, with the exact
      // pair path kept beside it for comparison
      val pairs = graft.operators.Dedup.ngramJaccard(kept, col("text"),
        col("doc_id"), freqIn = Some(freq))
      time("ngramJaccard pairs (exact)")(noop(pairs))
      val clusters = time("nearDupClusters (shipped)") {
        val c = graft.operators.Dedup.nearDupClusters(kept, col("text"), col("doc_id"))
        noop(c); c
      }
      val nonCanonical = clusters
        .filter(col("cluster_id") =!= col("doc_id")).select("doc_id")
      val deduped = kept.join(nonCanonical, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      val split = graft.operators.Sampling.hashSplit(deduped, col("doc_id"))
      val out = graft.operators.Sampling.packSequences(split, col("split"),
          col("doc_id"), col("n_tokens"), budget = 2048)
        .groupBy(col("shard").as("split"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      time("tail (anti+split+pack)")(noop(out))
      operators.OpCache.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
