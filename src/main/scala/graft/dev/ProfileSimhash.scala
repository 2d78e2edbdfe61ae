package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Candidate-mass decomposition of the wide-distance SimHash path
  * (dev tool): where do `dedup_simhash`'s seconds go at maxDistance
  * 12 — blocking-join collision mass, true Hamming-pair mass
  * (irreducible by blocking), or the exact-Jaccard rescore — and
  * which blocking variant minimizes it on a near-dup-rich corpus
  * where identical token profiles give identical 64-bit signatures
  * (word-permuted copies collide at Hamming 0). */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def measure[T](label: String)(f: => T): T = {
      val l = new PlanAudit.MetricsListener
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(l)
      println(f"[sh] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"shuffle ${l.shuffleWrite.sum / 1e6}%9.2f MB")
      r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // stage decomposition of the CURRENT simhashVerified path
    val survivors = measure("in-join-bound candidates (count)")(
      Dedup.simhashCandidates(docs, col("text"), col("doc_id")).count())
    println(s"[sh]   -> $survivors surviving candidate pairs")
    measure("E2E simhashVerified")(noop(
      Dedup.simhashVerified(docs, col("text"), col("doc_id"))))
    graft.operators.OpCache.releaseAll()
    measure("E2E simhashVerifiedIncremental %10")(noop(
      Dedup.simhashVerifiedIncremental(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
        col("text"), col("doc_id"))))
    graft.operators.OpCache.releaseAll()
    spark.stop()
  }
}
