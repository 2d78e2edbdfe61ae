package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JARO-WINKLER similarity as a native expression — the
 * edit-distance-free string scorer record linkage actually uses
 * (Winkler '90): tolerant of transpositions and rewarding shared
 * prefixes, which is what human-entered names/addresses need. Spark
 * ships `levenshtein` but no Jaro-Winkler; this is the graft kernel
 * behind [[graft.operators.Fuzzy]]'s similarity mode.
 *
 * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (so the
 * oracle is cross-engine exact, verified over the full name corpus):
 *   - both-empty and one-empty → 0.0 (DuckDB's convention)
 *   - match window = max(len)/2 − 1 (floor, min 0)
 *   - transpositions = out-of-order matched chars / 2, INTEGER
 *     division (odd counts floor — DuckDB's arithmetic)
 *   - Winkler boost ℓ·0.1·(1−jaro) with ℓ = common prefix ≤ 4,
 *     applied only when jaro > 0.7
 *
 * Scalar, allocation-light (two boolean arrays per call), codegen'd
 * via a static call so blocked joins keep whole-stage codegen.
 */
object StringSimExprs {

  /** Static so generated code can call it. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true
          tMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // transpositions halve with INTEGER division — DuckDB's exact
    // arithmetic (an odd out-of-order count floors, verified
    // empirically pair-by-pair over the name corpus)
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(n, m))
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression with BinaryLike[Expression] {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSimExprs.jaroWinkler($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
