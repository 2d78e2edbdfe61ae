package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * EXACT cross-engine canonicalization of doubles — the string a
 * portable sketch hashes for a floating-point field.
 *
 * Why not `cast(x as string)`: engine renderings of doubles disagree
 * in ways no printf format fixes — Spark/Java pads the SHORTEST
 * round-trip digits with zeros (`%.17e` of 0.1 is `1.000…0e-01` in
 * Java but the exact `1.00000000000000006e-01` in C/DuckDB), Java
 * keeps the sign of −0.0 where C printf drops it, and Java 17's
 * `Double.toString` is not even shortest (4.9E-324 vs 5e-324). Any
 * digit-producing path eventually rounds, and rounding ties break
 * differently across engines.
 *
 * So no digits: render the IEEE-754 value ITSELF. Every finite
 * nonzero double is ±m·2^(e) with one canonical (m, e) pair where
 * m ∈ [2^52, 2^53) — rendered as `{-}{m}p{e}` from the raw bits
 * (subnormals normalize into the same form by shifting). Any
 * IEEE-capable engine reproduces the pair with EXACT arithmetic and
 * no bit access: e via a power-of-two table (buildable by recursive
 * doubling — exact multiplications), m = |x|·2^(52−e) (exact:
 * power-of-two scaling of a value whose significand fits 53 bits;
 * split into two factors when 52−e exceeds the exponent range).
 * The graft oracle does exactly that in DuckDB SQL and the rendered
 * strings match byte-for-byte — validated across the full range
 * including subnormals, ±0, and ±1.7976931348623157e308.
 * Specials: NaN → "NaN", ±∞ → "Inf"/"-Inf", ±0.0 → "0" (a distinct
 * count should not distinguish the zero signs — SQL DISTINCT does
 * not either).
 */
object PortableNum {

  /** Canonical string of one double (see object docs). */
  def canon(v: Double): UTF8String = UTF8String.fromString(canonString(v))

  def canonString(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v == Double.PositiveInfinity) return "Inf"
    if (v == Double.NegativeInfinity) return "-Inf"
    if (v == 0.0) return "0" // covers -0.0 (== compares true)
    val bits = java.lang.Double.doubleToRawLongBits(v)
    val sign = if (bits < 0) "-" else ""
    val be = ((bits >>> 52) & 0x7FFL).toInt
    val m0 = bits & 0xFFFFFFFFFFFFFL
    if (be == 0) {
      // subnormal: normalize the significand into [2^52, 2^53)
      val b = 63 - java.lang.Long.numberOfLeadingZeros(m0)
      val m = m0 << (52 - b)
      s"$sign${m}p${b - 1126}"
    } else {
      val m = m0 | (1L << 52)
      s"$sign${m}p${be - 1075}"
    }
  }

  /** Catalyst expression: DOUBLE → canonical STRING. */
  case class CanonDouble(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"canon_double needs DOUBLE input, got ${child.dataType} " +
          "(cast floats to double first — the widening is exact)")
    override protected def nullSafeEval(input: Any): Any =
      canon(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.PortableNum.canon($c)")
    override protected def withNewChildInternal(newChild: Expression): CanonDouble =
      copy(child = newChild)
  }

  def canonDouble(c: Column): Column =
    GraftBridge.column(CanonDouble(GraftBridge.expression(c)))
}
