package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-inspection CLI: print the FORMATTED physical plan of any
 * catalog query without executing it (beyond the bounded plan-time
 * actions some operators perform, e.g. the PPJoin frequency
 * aggregation). The tool behind the per-operator plan audits —
 * pushed filters, read schemas, exchange placement, broadcast sides
 * and whole-stage-codegen spans are all visible in this output.
 *
 * Usage: runMain graft.ExplainQuery [sfDir] <query> [query...]
 */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery [sfDir] <query> [query...]")
    val (dir, names) =
      if (args.head.startsWith("/")) (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.001", args.toSeq)
    require(names.nonEmpty, "no query names given")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(
          s"unknown query '$name'; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"========== $name ==========")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      operators.OpCache.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
