package graft

import graft.functions.BloomExprs
import org.apache.spark.sql.functions._

/** Mergeable bloom filters: no false negatives, bounded false
  * positives, bit-exact partitioning invariance, and the driver-side
  * membership test matching the executor-side build. */
class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  private val keys = (1 to 500).map(i => s"k${i * 2654435761L % 100000}")
  private def df = keys.toDF("k")

  test("no false negatives: every inserted key tests positive on the driver") {
    val bytes = df.agg(BloomExprs.bloomBuild(col("k"), 8192).as("b"))
      .first().getAs[Array[Byte]]("b")
    keys.foreach(k => assert(BloomExprs.mightContain(bytes, k), k))
  }

  test("false positives bounded: absent keys mostly test negative") {
    // m/n = 8192/500 ≈ 16 bits/key, k=6 → fp ≈ 0.2%; allow 2% slack
    val bytes = df.agg(BloomExprs.bloomBuild(col("k"), 8192).as("b"))
      .first().getAs[Array[Byte]]("b")
    val absent = (1 to 1000).map(i => s"absent_$i")
    val fps = absent.count(BloomExprs.mightContain(bytes, _))
    assert(fps <= 20, s"$fps false positives of 1000 absent keys")
  }

  test("bits are identical under repartitioning (bit-wise OR is order-free)") {
    def bytes(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(BloomExprs.bloomBuild(col("k"), 4096).as("b"))
        .first().getAs[Array[Byte]]("b").toSeq
    assert(bytes(df) === bytes(df.repartition(13)))
  }

  test("per-group filters OR together to the global filter") {
    val grouped = df.withColumn("g", crc32(col("k")) % 5)
      .groupBy("g").agg(BloomExprs.bloomBuild(col("k"), 4096).as("b"))
      .collect().map(_.getAs[Array[Byte]]("b"))
    val merged = grouped.map(BloomExprs.fromBytes)
      .reduce(_ or _).toBytes.toSeq
    val direct = df.agg(BloomExprs.bloomBuild(col("k"), 4096).as("b"))
      .first().getAs[Array[Byte]]("b").toSeq
    assert(merged === direct)
  }

  test("corrupt bytes are rejected, not misread") {
    intercept[IllegalArgumentException] {
      BloomExprs.fromBytes(Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] { // absurd header
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(Int.MaxValue).putInt(99)
      BloomExprs.fromBytes(bb.array())
    }
  }
}
