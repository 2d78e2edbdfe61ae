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
      // int8 quantization is a pure projection over the embedding store
      Queries.embQuantize(spark, sf("sf0.01"))
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

  test("substring dedup: 64-bit window ids cut the measured shuffle vs md5") {
    def run(hash64: Boolean) = PlanAudit.measure(spark) {
      operators.Dedup.dedupSubstrings(docs, col("text"), col("doc_id"),
          w = 8, hash64 = hash64)
        .write.format("noop").mode("overwrite").save()
    }
    val md5Path = run(hash64 = false)
    val h64Path = run(hash64 = true)
    assert(md5Path("shuffle_write_bytes") > 0)
    // 8-byte longs vs 32-char hex strings on the dominant per-token
    // window-id exchange: expect well under 60% of the md5 volume
    assert(h64Path("shuffle_write_bytes") < md5Path("shuffle_write_bytes") * 6 / 10,
      s"compact ids should shrink shuffle: md5=$md5Path h64=$h64Path")
  }
}
