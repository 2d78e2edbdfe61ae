package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: headline queries (SURVEY.md §6) against
 * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
 *
 * Each query is forced through the `noop` sink — unlike `.count()`,
 * which Catalyst collapses to a metadata-only scan for pure
 * projections, noop executes the full physical plan (all expressions,
 * all shuffles) without write-side cost. One q1 warmup run pays the
 * JVM/codegen startup so per-query numbers measure the plan.
 */
object Bench {
  /** Headline set: the scale-critical operators, per SURVEY.md §6. */
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_revenue", "q5_nation_revenue", "q_top_customers",
    "q_events_hourly", "q_sessions", "q_event_pivot",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "sim_topk", "sim_lsh", "sim_ivf", "text_quality", "field_stats", "validate_ok",
    "multimodal_meta", "pipeline_docs")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_pricing") // warmup: JVM + codegen + parquet footer cache
    val results = headline.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
