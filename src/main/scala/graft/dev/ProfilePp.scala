package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-mass decomposition of the exact PPJoin pair path (dev
  * tool): how many distinct candidate pairs the prefix join emits vs
  * how many survive exact rescoring, and where the shuffle bytes go —
  * the measurement that decides whether a further candidate filter
  * (suffix filtering) can pay on `dedup_ngram_jaccard` /
  * `pipeline_docs`, or the mass is genuine pair output. */
object ProfilePp {
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
      println(f"[pp] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"shuffle ${l.shuffleWrite.sum / 1e6}%9.2f MB")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    noop(docs.select(count(lit(1))))
    val threshold = 0.8

    val sigs = graft.operators.Dedup.shingleSigs(docs, col("text"), col("doc_id"), 3)
    measure("sigs materialize")(println(s"[pp]   sig rows = ${sigs.count()}, " +
      s"mean |sh| = ${sigs.select(avg(size(col("sh")))).collect()(0).getDouble(0)}"))

    val cand = graft.operators.OpCache.cache(
      graft.operators.Dedup.prefixCandidates(sigs, threshold, freqOrdered = true))
    val nCand = measure("candidates (distinct pairs)") { cand.count() }
    println(s"[pp]   candidate pairs = $nCand")

    val genuine = measure("rescore (classic)") {
      graft.operators.Dedup.rescore(cand, sigs, threshold).count()
    }
    println(s"[pp]   genuine pairs = $genuine  " +
      f"(false-candidate fraction = ${1.0 - genuine.toDouble / math.max(1, nCand)}%.3f)")

    val genuineF = measure("rescore (fp prefilter)") {
      graft.operators.Dedup.rescore(cand, sigs, threshold, prefilter = true).count()
    }
    require(genuineF == genuine, s"prefilter changed the pair count: $genuineF != $genuine")
    graft.operators.OpCache.releaseAll()

    // --- the BANDED family: how much of dedup_minhash's verification
    // mass is false band collisions vs genuine pairs? ---
    {
      import graft.functions.TextHashExprs
      val bsigs = graft.operators.OpCache.cache(docs
        .select(col("doc_id"),
          TextHashExprs.minhashWithShingles(col("text"), 3, 32).as("b"))
        .filter(col("b").isNotNull)
        .select(col("doc_id"), col("b.sig").as("sig"), col("b.sh").as("sh")))
      val banded = graft.operators.Dedup.bandFrame(
        bsigs.select("doc_id", "sig"), 16, 2)
      val bcand = graft.operators.OpCache.cache(
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_hash") === col("b.band_hash") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct())
      val nB = measure("banded candidates (distinct)") { bcand.count() }
      val gB = measure("banded rescore") {
        graft.operators.Dedup.rescore(bcand, bsigs, threshold).count()
      }
      println(f"[pp]   banded: $nB candidates, $gB genuine " +
        f"(false fraction ${1.0 - gB.toDouble / math.max(1, nB)}%.3f)")
      graft.operators.OpCache.releaseAll()
    }

    graft.operators.OpCache.releaseAll()
    spark.stop()
  }
}
