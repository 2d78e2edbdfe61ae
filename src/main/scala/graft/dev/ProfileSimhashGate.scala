package graft.dev

import graft.operators.{Dedup, OpCache}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost decomposition of the simhash pre-flight gate at a
  * given SF dir — signatures, bucket agg, operator gate-off/on. */
object ProfileSimhashGate {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_docs10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](n: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[gateprof] $n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      OpCache.releaseAll(); spark.catalog.clearCache()
    }
    time("warmup sig count")(
      Dedup.simhashSignatures(docs, col("text"), col("doc_id")).count())
    time("sig count")(
      Dedup.simhashSignatures(docs, col("text"), col("doc_id")).count())
    time("bucket agg")(println("  perDoc=" + Dedup.simhashBucketEvalsPerDoc(
      Dedup.simhashSignatures(docs, col("text"), col("doc_id")), 12)))
    time("verified gate OFF")(
      Dedup.simhashVerified(docs, col("text"), col("doc_id"),
        maxCandidatesPerDoc = 0).write.format("noop").mode("overwrite").save())
    time("verified gate ON")(
      Dedup.simhashVerified(docs, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
