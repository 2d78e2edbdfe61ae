package graft

import graft.functions.CmsExprs
import org.apache.spark.sql.functions._

/** Mergeable Count-Min sketches: one-sided error bound, bit-exact
  * partitioning invariance, the persist-then-union flow, and SQL
  * registry access. */
class CmsSpec extends SparkSpecBase {
  import spark.implicits._

  // Zipf-ish corpus: token t_k appears k times (k = 1..200), so true
  // frequencies are known exactly and span 1..200
  private def zipf = (1 to 200).flatMap(k => Seq.fill(k)(s"t$k"))
    .toDF("tok")

  test("estimates are one-sided: never below truth, within eps*N above") {
    val sk = zipf.agg(CmsExprs.cmsSketch(col("tok")).as("s"))
    val n = 200 * 201 / 2 // total updates
    val checks = Seq("t200" -> 200L, "t100" -> 100L, "t17" -> 17L, "t1" -> 1L)
    val ests = checks.map { case (t, _) =>
      sk.select(CmsExprs.cmsEstimate(col("s"), lit(t))).first().getLong(0) }
    checks.zip(ests).foreach { case ((t, truth), est) =>
      assert(est >= truth, s"$t: estimate $est below true count $truth")
      // eps = e/w; bound holds with prob 1 - e^-d, deterministic here
      assert(est <= truth + (math.E / CmsExprs.DefaultWidth * n).ceil.toLong + 1,
        s"$t: estimate $est too far above $truth")
    }
    // an absent token collides into existing counters only
    val absent = sk.select(CmsExprs.cmsEstimate(col("s"), lit("nope"))).first().getLong(0)
    assert(absent <= (math.E / CmsExprs.DefaultWidth * n).ceil.toLong + 1)
  }

  test("counters are bit-identical under repartitioning (exact adds)") {
    def bytes(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(CmsExprs.cmsSketch(col("tok")).as("s"))
        .first().getAs[Array[Byte]]("s").toSeq
    assert(bytes(zipf) === bytes(zipf.repartition(13)))
  }

  test("persisted per-group sketches union to the global sketch bit-for-bit") {
    val df = zipf.withColumn("day", (crc32(col("tok")) % 7))
    val daily = df.groupBy("day").agg(CmsExprs.cmsSketch(col("tok")).as("sketch"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms").toString
    daily.write.mode("overwrite").parquet(tmp)
    val merged = spark.read.parquet(tmp)
      .agg(CmsExprs.cmsUnion(col("sketch")).as("s"))
      .first().getAs[Array[Byte]]("s").toSeq
    val direct = zipf.agg(CmsExprs.cmsSketch(col("tok")).as("s"))
      .first().getAs[Array[Byte]]("s").toSeq
    assert(direct === merged, "union of partial sketches must equal the global sketch")
    // and the unioned sketch still answers point queries
    val est = spark.read.parquet(tmp)
      .agg(CmsExprs.cmsEstimate(CmsExprs.cmsUnion(col("sketch")), lit("t200")).as("e"))
      .first().getLong(0)
    assert(est >= 200L)
  }

  test("join-size estimate: one-sided over the exact equi-join count") {
    // orders join lineitem on orderkey: exact size known, keys skewed
    val a = spark.range(1, 501).select((col("id") % 50).as("k"))       // 500 rows, 50 keys
    val b = spark.range(1, 2001).select((col("id") % 100).as("k"))     // 2000 rows, 100 keys
    val exact = a.join(b, "k").count()
    val est = a.agg(CmsExprs.cmsSketch(col("k")).as("sa"))
      .crossJoin(b.agg(CmsExprs.cmsSketch(col("k")).as("sb")))
      .select(CmsExprs.cmsJoinSize(col("sa"), col("sb")).as("e"))
      .first().getLong(0)
    assert(est >= exact, s"join-size estimate $est below exact $exact")
    // eps*Na*Nb slack (e/w * 500 * 2000)
    val slack = (math.E / CmsExprs.DefaultWidth * 500L * 2000L).ceil.toLong
    assert(est <= exact + slack, s"estimate $est too far above $exact (+$slack)")
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    a.createOrReplaceTempView("cms_a"); b.createOrReplaceTempView("cms_b")
    val sqlEst = spark.sql(
      """SELECT cms_join_size((SELECT cms_sketch(k) FROM cms_a),
        |                     (SELECT cms_sketch(k) FROM cms_b)) AS e""".stripMargin)
      .first().getLong(0)
    assert(sqlEst === est)
  }

  test("join-size inner product saturates on overflow instead of wrapping") {
    // counters ~2^31 per cell: each cell product is 2^62, so summing two
    // cells overflows Long — the row must saturate to Long.MaxValue (and
    // stay one-sided), never wrap to a negative/garbage estimate
    val huge = new CmsExprs.Cms(1, 16, Array.fill(16)(1L << 31))
    val sat = spark.range(1)
      .select(CmsExprs.cmsJoinSize(lit(huge.toBytes), lit(huge.toBytes)).as("e"))
      .first().getLong(0)
    assert(sat === Long.MaxValue, s"overflowed row must saturate, got $sat")
    // a non-overflowing row still wins the min over a saturated one
    val mixed = new CmsExprs.Cms(2, 16,
      Array.fill(16)(1L << 31) ++ Array.fill(16)(3L))
    val est = spark.range(1)
      .select(CmsExprs.cmsJoinSize(lit(mixed.toBytes), lit(mixed.toBytes)).as("e"))
      .first().getLong(0)
    assert(est === 16L * 9L, "clean row must provide the min")
  }

  test("corrupt binary input fails loudly as 'not a CMS sketch'") {
    def allMsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ allMsgs(e.getCause))
    // too short for a header
    val e1 = intercept[Exception] {
      spark.range(1)
        .select(CmsExprs.cmsEstimate(lit(Array[Byte](1, 2, 3)), lit("x")))
        .collect()
    }
    assert(allMsgs(e1).exists(_.contains("not a CMS sketch")))
    // plausible header claiming a gigabyte-scale shape with no payload:
    // must be rejected by the length check, not allocated
    val bogus = java.nio.ByteBuffer.allocate(16).putInt(8).putInt(1 << 24).array()
    val e2 = intercept[Exception] {
      spark.range(1)
        .select(CmsExprs.cmsJoinSize(lit(bogus), lit(bogus)))
        .collect()
    }
    assert(allMsgs(e2).exists(_.contains("not a CMS sketch")))
  }

  test("SQL misuse fails at analysis time, not at runtime") {
    graft.functions.GraftFunctions.register(spark)
    Seq(true, false).toDF("b").createOrReplaceTempView("cms_bool")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cms_sketch(b) FROM cms_bool").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // sketch argument must be BINARY, not a string
      spark.sql("SELECT cms_estimate('junk', 1)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cms_join_size('junk', 'junk')").collect()
    }
  }

  test("SQL registry: cms_sketch/cms_union/cms_estimate round-trip") {
    graft.functions.GraftFunctions.register(spark)
    zipf.createOrReplaceTempView("cms_toks")
    val est = spark.sql(
      """SELECT cms_estimate(cms_sketch(tok), 't150') AS e FROM cms_toks""")
      .first().getLong(0)
    assert(est >= 150L)
  }

  test("SQL registry: portable sketch functions round-trip") {
    graft.functions.GraftFunctions.register(spark)
    zipf.createOrReplaceTempView("cms_toks_p")
    val est = spark.sql(
      """SELECT cms_estimate_portable(cms_sketch_portable(tok), 't150') AS e
        |FROM cms_toks_p""".stripMargin).first().getLong(0)
    assert(est >= 150L)
    val hll = spark.sql(
      """SELECT hll_estimate(hll_sketch_portable(tok)) AS e FROM cms_toks_p""")
      .first().getLong(0)
    // linear-counting regime: near-exact (a register collision among
    // 200 keys at m=4096 can nudge the log estimate by ±1-2)
    assert(math.abs(hll - 200L) <= 4, s"200 distinct tokens, got $hll")
  }

  test("portable sketch: one-sided, partition-invariant, string-only") {
    val sk = zipf.agg(CmsExprs.cmsSketch(col("tok"), portable = true).as("s"))
    val n = 200 * 201 / 2
    Seq("t200" -> 200L, "t17" -> 17L).foreach { case (t, truth) =>
      val est = sk.select(CmsExprs.cmsEstimate(col("s"), lit(t),
        portable = true)).first().getLong(0)
      assert(est >= truth, s"$t: portable estimate $est below $truth")
      assert(est <= truth + (math.E / CmsExprs.DefaultWidth * n).ceil.toLong + 1)
    }
    def bytes(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(CmsExprs.cmsSketch(col("tok"), portable = true).as("s"))
        .first().getAs[Array[Byte]]("s").toSeq
    assert(bytes(zipf) === bytes(zipf.repartition(13)),
      "portable counters must be partitioning-invariant bit-for-bit")
    // non-string input fails loudly (string rendering is the
    // cross-engine canonical form)
    val ex = intercept[Exception] {
      spark.range(10).agg(CmsExprs.cmsSketch(col("id"),
        portable = true)).collect()
    }
    assert(ex.getMessage.contains("STRING") ||
      Option(ex.getCause).exists(_.getMessage.contains("STRING")))
  }
}
