package graft

import graft.functions.HllExprs
import org.apache.spark.sql.functions._

/** Mergeable HLL sketches: accuracy vs exact distinct, bit-exact
  * partitioning invariance, and the persist-then-union flow. */
class HllSpec extends SparkSpecBase {
  import spark.implicits._

  test("estimate within 3% of exact on 20k distinct longs (p=12)") {
    val df = spark.range(20000).toDF("v")
    val est = df.agg(HllExprs.hllEstimate(
      HllExprs.hllSketch(col("v"))).as("e")).first().getLong(0)
    val err = math.abs(est - 20000.0) / 20000.0
    info(f"hll estimate $est (err ${err * 100}%.2f%%)")
    assert(err < 0.03, s"estimate $est too far from 20000")
  }

  test("sketch registers are bit-identical under repartitioning") {
    val df = spark.range(5000).toDF("v")
    def regs(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(HllExprs.hllSketch(col("v")).as("s"))
        .first().getAs[Array[Byte]]("s").toSeq
    assert(regs(df) === regs(df.repartition(13)),
      "max-merge must make sketches partitioning-invariant")
  }

  test("persisted per-group sketches union to the global estimate") {
    // the incremental flow: sketch per 'day', write, read back, union
    val df = spark.range(30000)
      .select(col("id").as("v"), (col("id") % 10).as("day"))
    val daily = df.groupBy("day").agg(HllExprs.hllSketch(col("v")).as("sketch"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll").toString
    daily.write.mode("overwrite").parquet(tmp)
    val unioned = spark.read.parquet(tmp)
      .agg(HllExprs.hllEstimate(HllExprs.hllUnion(col("sketch"))).as("e"))
      .first().getLong(0)
    val err = math.abs(unioned - 30000.0) / 30000.0
    info(f"unioned estimate $unioned (err ${err * 100}%.2f%%)")
    assert(err < 0.03)
    // union == sketching everything at once, bit-for-bit
    val direct = df.agg(HllExprs.hllSketch(col("v")).as("s"))
      .first().getAs[Array[Byte]]("s").toSeq
    val merged = spark.read.parquet(tmp)
      .agg(HllExprs.hllUnion(col("sketch")).as("s"))
      .first().getAs[Array[Byte]]("s").toSeq
    assert(direct === merged, "union of partial sketches must equal the global sketch")
  }

  test("string inputs and small-range linear counting") {
    val df = Seq("a", "b", "c", "a", "b", "a").toDF("v")
    val est = df.agg(HllExprs.hllEstimate(
      HllExprs.hllSketch(col("v"))).as("e")).first().getLong(0)
    assert(est === 3L, s"tiny cardinalities must be exact via linear counting, got $est")
  }

  test("portable sketch: accurate, partition-invariant, string-only") {
    val df = spark.range(20000).select(col("id").cast("string").as("v"))
    val est = df.agg(HllExprs.hllEstimate(
      HllExprs.hllSketch(col("v"), 12, portable = true)).as("e")).first().getLong(0)
    val err = math.abs(est - 20000.0) / 20000.0
    info(f"portable hll estimate $est (err ${err * 100}%.2f%%)")
    assert(err < 0.03, s"portable estimate $est too far from 20000")

    def regs(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(HllExprs.hllSketch(col("v"), 12, portable = true).as("s"))
        .first().getAs[Array[Byte]]("s").toSeq
    assert(regs(df) === regs(df.repartition(13)),
      "portable sketches must be partitioning-invariant bit-for-bit")

    // non-string input must fail loudly, not silently hash a
    // non-canonical rendering
    val ex = intercept[Exception] {
      spark.range(10).agg(HllExprs.hllEstimate(
        HllExprs.hllSketch(col("id"), 12, portable = true))).collect()
    }
    assert(ex.getMessage.contains("STRING") ||
      Option(ex.getCause).exists(_.getMessage.contains("STRING")))
  }
}
