package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.Pattern

/**
 * Native expression for document quality features: one pass over the
 * string instead of a tree of `split`/`filter`/`regexp_replace` HOFs
 * that each re-materialize token arrays per row (the HOF version was
 * the 3rd-slowest headline query at sf0.1 — 12 s for 5000 docs).
 *
 * Arithmetic and tokenization are EXACTLY the oracle's semantics:
 * tokens = Java-regex `\s+` split of the trimmed text (empty → 0),
 * stopwords matched case-sensitively, punctuation = code points of the
 * lowercased text outside [a-z0-9\s], ratios as single double
 * divisions of exact ints — so the DuckDB hash-match still holds.
 *
 * The expression has a REAL `doGenCode` (a static call into
 * [[TextFeatures.evalQuality]]), not CodegenFallback: Spark's
 * whole-stage subexpression elimination skips any tree containing a
 * CodegenFallback node, so a fallback version is re-evaluated once per
 * struct-field reference — 6 fields + a quality filter meant ~7 full
 * text passes per row in the composed pipelines. With codegen the
 * projection evaluates the struct once and the getFields share it.
 */
object TextFeatures {

  val Fields: Seq[(String, DataType)] = Seq(
    "n_tokens" -> IntegerType, "n_stop" -> IntegerType, "n_punct" -> IntegerType,
    "stop_ratio" -> DoubleType, "punct_ratio" -> DoubleType,
    "quality_score" -> DoubleType)

  private val ws = Pattern.compile("\\s+")

  /** One-pass quality features; static so generated code can call it. */
  def evalQuality(v: UTF8String, stopSet: java.util.HashSet[String]): InternalRow = {
    val s = v.toString
    val trimmed = s.trim
    var nTokens = 0
    var nStop = 0
    if (trimmed.nonEmpty) {
      val toks = ws.split(trimmed, -1)
      nTokens = toks.length
      var i = 0
      while (i < toks.length) {
        if (stopSet.contains(toks(i))) nStop += 1
        i += 1
      }
    }
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var nPunct = 0
    var nChars = 0
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      nChars += 1
      val isKept = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
        cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      if (!isKept) nPunct += 1
      i += Character.charCount(cp)
    }
    val stopRatio = if (nTokens == 0) 0.0 else nStop.toDouble / nTokens
    val punctRatio = if (nChars == 0) 0.0 else nPunct.toDouble / nChars
    val score = stopRatio * 0.5 + (1.0 - punctRatio) * 0.5
    InternalRow(nTokens, nStop, nPunct, stopRatio, punctRatio, score)
  }

  case class TextQualityExpr(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType =
      StructType(Fields.map { case (n, t) => StructField(n, t, nullable = false) })
    override def nullable: Boolean = true

    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val h = new java.util.HashSet[String]()
      stopwords.foreach(h.add)
      h
    }

    override def nullSafeEval(v: Any): Any =
      evalQuality(v.asInstanceOf[UTF8String], stopSet)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val stopRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextFeatures.evalQuality($c, $stopRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def qualityStruct(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextQualityExpr(GraftBridge.expression(text), stopwords))

  val EntropyFields: Seq[(String, DataType)] = Seq(
    "n_codepoints" -> IntegerType, "n_distinct_chars" -> IntegerType,
    "char_entropy" -> DoubleType, "entropy_ratio" -> DoubleType)

  /** Round half-away-from-zero at 6 dp — both Spark's `round()` and
    * DuckDB's ROUND, so cross-engine sums that differ in the last
    * ulps (summation order) still hash-match. */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** One-pass Shannon char-entropy features; static for codegen. */
  def evalEntropy(v: UTF8String): InternalRow = {
    val s = v.toString
    val counts = new java.util.TreeMap[Integer, Integer]() // sorted => deterministic sum order
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    val distinct = counts.size
    val ratio = if (distinct > 1) h / (math.log(distinct.toDouble) / math.log(2.0)) else 0.0
    InternalRow(n, distinct, r6(h), r6(ratio))
  }

  /**
   * CHAR-ENTROPY quality signal — Shannon entropy over the document's
   * code-point distribution plus its normalized form (entropy /
   * log2(alphabet)). Low entropy ⇒ repetitive/degenerate text
   * (keyboard mashing, padding, single-char floods); near-1 ratio ⇒
   * the document uses its alphabet uniformly. The cheap
   * compression-ratio proxy corpus filters use when a real compressor
   * per document is too expensive. Scan-side, one pass, codegen'd —
   * zero shuffle at any corpus size. Empty text ⇒ null (no
   * distribution to measure).
   */
  case class CharEntropyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      StructType(EntropyFields.map { case (n, t) => StructField(n, t, nullable = false) })
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val u = v.asInstanceOf[UTF8String]
      if (u.numBytes == 0) null else evalEntropy(u)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""if ($c.numBytes() == 0) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.TextFeatures.evalEntropy($c); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def entropyStruct(text: Column): Column =
    GraftBridge.column(CharEntropyExpr(GraftBridge.expression(text)))
}
