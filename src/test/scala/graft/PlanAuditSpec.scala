package graft

import graft.dev.PlanAudit
import org.apache.spark.sql.functions._

/** Measured (not plan-string) shuffle contracts: the scan-side
  * operators must move ZERO bytes through shuffle, and exact dedup
  * must shuffle far less than it reads (keys, not payloads). */
class PlanAuditSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")

  test("scan-side operators shuffle zero bytes (classifier, script, gopher)") {
    val m = PlanAudit.measure(spark) {
      val w = operators.Scoring.syntheticWeights(4096)
      operators.Scoring.classifyQuality(docs, col("text"), w)
        .write.format("noop").mode("overwrite").save()
      docs.select(col("doc_id") +: TextAnalysisCols.scriptProfile(col("text")): _*)
        .write.format("noop").mode("overwrite").save()
      docs.select(col("doc_id") +: TextAnalysisCols.gopherFeatures(col("text")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    assert(m("input_bytes") > 0, s"expected real input: $m")
    assert(m("shuffle_write_bytes") === 0L,
      s"scan-side ops must not shuffle: $m")
  }

  test("exact dedup shuffle volume tracks row count, NOT document size") {
    def run(d: org.apache.spark.sql.DataFrame) = PlanAudit.measure(spark) {
      operators.Dedup.exact(d, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    val m1 = run(docs)
    // same rows, 10x the text: if the exchange carried documents the
    // shuffle would grow ~10x; carrying (md5, id) keys it stays flat
    val fat = docs.withColumn("text",
      concat_ws(" ", Seq.fill(10)(col("text")): _*))
    val m10 = run(fat)
    assert(m1("shuffle_write_bytes") > 0, s"dedup must group: $m1")
    assert(m10("shuffle_write_bytes") < m1("shuffle_write_bytes") * 2,
      s"shuffle grew with document size: 1x=$m1 10x=$m10")
    assert(m10("disk_spill_bytes") === 0L, s"no spill expected at sf0.01: $m10")
  }
}
