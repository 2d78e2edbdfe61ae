package graft.dev

import graft.operators.{Chunking, Dedup, OpCache, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev harness: empirical 8× scale probe of the heaviest operators.
 * Unions the sf0.1 documents table 8 times (doc_id offset per copy,
 * sources remapped so per-source stages see 8× df too) and times
 * near-dup dedup, boilerplate stripping and the global order — the
 * operators whose cost curves matter at 100 TB. A super-linear
 * blow-up here (candidate explosion, skewed shuffle, single-reducer
 * sort) is a design bug the small-SF gates cannot see.
 *
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.dev.ScaleProbe"
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      // graft's bounded-heap top-k agg (TopKExprs) keeps one k-sized
      // buffer per query id; the 128-group default would push it into
      // sort-based fallback (re-sorting the candidate frame — the
      // exact spill this agg exists to remove). Catalog sketch aggs
      // (HLL/CMS/DDSketch) only ever group by low-cardinality keys,
      // so the raised cap never bites them.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = base.count()
    val big = (0 until copies).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
        concat(col("source"), lit(s"_c$i")).as("source"), col("text"))
    }.reduce(_ unionByName _)
    println(s"[probe] corpus: ${n0 * copies} docs ($copies x $n0)")

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      OpCache.releaseAll(); spark.catalog.clearCache()
    }

    // NB: every copy is an exact near-dup of the original, so TRUE
    // pair output grows ~copies²/2 — runtime here tracks the result
    // size (reported below), not a candidate explosion
    time("ngram_jaccard") {
      val pairs = Dedup.ngramJaccard(big, col("text"), col("doc_id")).count()
      println(s"[probe] ngram pairs: $pairs")
    }
    time("strip_boilerplate") {
      Chunking.stripBoilerplate(big,
        concat(col("text"), lit("\nAD: subscribe now!\n(c) "), col("source")),
        col("doc_id"), col("source"))
        .write.format("noop").mode("overwrite").save()
    }
    time("global_order") {
      Sampling.globalOrder(big, col("doc_id"), "probe")
        .write.format("noop").mode("overwrite").save()
    }
    time("paragraph_dedup") {
      Dedup.dedupParagraphs(big, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    // NB: same caveat as ngram_jaccard — every copy duplicates every
    // 5-gram, so the >=2-docs dup set saturates (≈ every ngram) and
    // the instance join fans out to the full instance count; this is
    // the dup-heavy worst case, not the typical-corpus case
    time("dup_ngram_coverage") {
      Dedup.dupNgramCoverage(big, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("lexical_familiarity") {
      Chunking.lexicalFamiliarity(big, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bigEmb = (0 until copies).map { i =>
      embBase.select((col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)
    // exact-copy stress: every cell holds `copies` clones of each
    // member, so within-cell pair output grows ~copies² — the √n
    // codebook keeps cell size (and the equi-join fan-out) sublinear
    time("semdedup") {
      val cents = graft.operators.Similarity.trainKmeans(
        bigEmb, col("vec_id"), col("embedding"),
        nlist = math.max(16, math.ceil(math.sqrt((n0 * copies).toDouble)).toInt))
      graft.operators.Similarity.semDedup(
          bigEmb, col("vec_id"), col("embedding"), cents, threshold = 0.95)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
