package graft

import graft.functions.PortableNum
import org.apache.spark.sql.functions._

/** Exact canonical double rendering — the cross-engine hash input for
  * portable sketches over floating-point fields. The pinned strings
  * here were validated against the DuckDB replay (pow2-table
  * decomposition) over the full range incl. subnormals and ±0. */
class PortableNumSpec extends SparkSpecBase {
  import spark.implicits._

  test("canonical strings: pinned adversarial values") {
    val cases = Seq(
      1e7 -> "5368709120000000p-29",           // the 1e7 rendering boundary
      0.1 -> "7205759403792794p-56",
      math.pow(2, -27) -> "4503599627370496p-79",
      4.9e-324 -> "4503599627370496p-1126",    // min subnormal, normalized form
      1.7976931348623157e308 -> "9007199254740991p971", // max double
      901.82 -> "7932492609287619p-43",
      -3.14159 -> "-7074231776675438p-51",
      1.0 -> "4503599627370496p-52",
      0.5 -> "4503599627370496p-53",
      2.2250738585072014e-308 -> "4503599627370496p-1074", // min normal
      1e-310 -> "5181497684667136p-1082")      // mid subnormal
    cases.foreach { case (v, want) =>
      assert(PortableNum.canonString(v) === want, s"canon($v)")
    }
    // zero signs collapse; specials are literals
    assert(PortableNum.canonString(0.0) === "0")
    assert(PortableNum.canonString(-0.0) === "0")
    assert(PortableNum.canonString(Double.NaN) === "NaN")
    assert(PortableNum.canonString(Double.PositiveInfinity) === "Inf")
    assert(PortableNum.canonString(Double.NegativeInfinity) === "-Inf")
  }

  test("canonical form round-trips: m * 2^e reconstructs the exact double") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(2000)(
      java.lang.Double.longBitsToDouble(rng.nextLong())).filter(v =>
      !v.isNaN && !v.isInfinite && v != 0.0)
    vals.foreach { v =>
      val s = PortableNum.canonString(v)
      val neg = s.startsWith("-")
      val Array(m, e) = s.stripPrefix("-").split('p')
      val back = Math.scalb(m.toLong.toDouble, e.toInt) * (if (neg) -1 else 1)
      assert(back === v, s"round-trip($v) via $s gave $back")
      // and the mantissa is the canonical normalized one
      assert(m.toLong >= (1L << 52) && m.toLong < (1L << 53), s"m out of range in $s")
    }
  }

  test("the Catalyst expression matches the static helper, codegen on") {
    val vals = Seq(1e7, -0.0, 0.1, 901.82, Double.NaN, 4.9e-324)
    val out = vals.toDF("v")
      .select(PortableNum.canonDouble(col("v")).as("c"))
      .as[String].collect()
    assert(out.toSeq === vals.map(PortableNum.canonString))
    // float route: exact widening then the same rendering
    val f = Seq(1.5f).toDF("v")
      .select(PortableNum.canonDouble(col("v").cast("double"))).as[String].first()
    assert(f === PortableNum.canonString(1.5))
  }
}
