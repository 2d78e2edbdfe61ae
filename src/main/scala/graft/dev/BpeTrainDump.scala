package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * PROVENANCE TOOL for the pinned BPE merge table behind the
 * `bpe_tokens` catalog query: trains `numMerges` merges with
 * [[graft.operators.Bpe.trainMerges]] on the documents table of the
 * given SF dir and prints them as the exact Scala literal pinned in
 * [[graft.Queries.BpePinnedMerges]]. Re-run to audit that the pinned
 * table is what the trainer produces:
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.dev.BpeTrainDump"
 */
object BpeTrainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-bpe-train-dump")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val docs = graft.sources.Readers.table(spark, sfDir, "documents")
      val merges = graft.operators.Bpe.trainMerges(docs, col("text"), numMerges = 50)
      println("  val BpePinnedMerges: Seq[(String, String)] = Seq(")
      println(merges.map { case (l, r) =>
        def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        s"    (${q(l)}, ${q(r)})"
      }.mkString(",\n"))
      println("  )")
    } finally spark.stop()
  }
}
