package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MERGEABLE HyperLogLog sketches as first-class values (Flajolet et
 * al. '07; the practical presentation follows Heule et al.,
 * EDBT'13). `approx_count_distinct` answers "how many distinct NOW"
 * — but at 100 TB the question is incremental: distinct tokens per
 * DAY, persisted, then unioned over any window without rescanning a
 * byte. These aggregates make the sketch itself the column value:
 *
 *   hll_sketch(col)     → binary (4 KB registers at p=12) per group
 *   hll_union(sketch)   → binary — merge previously-built sketches
 *   hll_estimate(sketch)→ bigint — the distinct estimate
 *
 * Register arrays are MAX-merged, so sketches are associative,
 * commutative and idempotent — partitioning-invariant bit-for-bit,
 * re-ingesting a day is harmless, and a year is the union of 365
 * 4 KB rows. Hashing is Spark's own XXH64 (seed 42), stable across
 * runs and engines that embed it.
 */
object HllExprs {

  private val Seed = 42L

  /** Bits of hash a PORTABLE sketch uses: the first 13 hex chars of
    * md5 — the largest prefix that parses losslessly into a signed
    * 64-bit int on every engine (the repo-wide deterministic-uniform
    * convention). Register index takes the top p bits, rank the
    * remaining (52-p); max storable rank is 52-p+1. */
  private val PortableBits = 52

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Top 52 bits of md5(utf8 bytes) — equals DuckDB's
    * `CAST('0x' || substr(md5(s), 1, 13) AS BIGINT)`. Portable
    * hashing is STRING-ONLY by design: every engine renders its own
    * numeric-to-string forms, so the caller casts to string first and
    * owns that the rendering is canonical across engines. */
  private[functions] def hash52(v: Any, dt: DataType): Long =
    md5Pair(v, dt)._1

  /** BOTH 52-bit md5 prefixes of a value — hex chars 1-13 and 14-26,
    * i.e. DuckDB's `CAST('0x'||substr(md5(s),1,13) AS BIGINT)` and
    * `...substr(md5(s),14,13)...` — one digest. The second value is
    * the independent companion for Kirsch-Mitzenmacher double hashing
    * (portable CMS rows: h1 + i·h2). */
  private[functions] def md5Pair(v: Any, dt: DataType): (Long, Long) = {
    require(dt == StringType,
      "portable sketch input must be STRING (cast first: the string " +
        s"rendering is the cross-engine canonical form); got $dt")
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val d = md5Local.get()
    d.reset()
    val md = d.digest(bytes)
    // nibbles 0-12 = top 52 of the first 7 bytes' 56 bits
    val b56 =
      ((md(0) & 0xffL) << 48) | ((md(1) & 0xffL) << 40) |
      ((md(2) & 0xffL) << 32) | ((md(3) & 0xffL) << 24) |
      ((md(4) & 0xffL) << 16) | ((md(5) & 0xffL) << 8) | (md(6) & 0xffL)
    // nibbles 13-25 = low nibble of byte 6 then bytes 7-12
    val h2 =
      ((md(6) & 0x0fL) << 48) | ((md(7) & 0xffL) << 40) |
      ((md(8) & 0xffL) << 32) | ((md(9) & 0xffL) << 24) |
      ((md(10) & 0xffL) << 16) | ((md(11) & 0xffL) << 8) | (md(12) & 0xffL)
    (b56 >>> 4, h2)
  }

  /** Register update for a 52-bit portable hash. */
  private[functions] def addHash52(regs: Array[Byte], p: Int, h: Long): Unit = {
    val w = PortableBits - p
    val idx = (h >>> w).toInt
    val rem = h & ((1L << w) - 1L)
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rem) // 0 for rem=0
    val rank = w + 1 - bitlen
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  private[functions] def hashOf(v: Any, dt: DataType): Long = dt match {
    case LongType => XXH64.hashLong(v.asInstanceOf[Long], Seed)
    case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, Seed)
    case StringType =>
      val s = v.asInstanceOf[UTF8String]
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    case DoubleType =>
      XXH64.hashLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), Seed)
    case other => throw new IllegalArgumentException(
      s"hll_sketch: unsupported input type $other")
  }

  /** Set the register for hash `h` in `regs` (p = log2 registers). */
  private[functions] def addHash(regs: Array[Byte], p: Int, h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  /** Standard HLL estimate with linear-counting small-range bias
    * correction (64-bit hashes need no large-range correction). */
  private[functions] def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  private def maxMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"cannot union sketches of different precisions (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** Build a sketch from raw values. */
  /** `portable = true` switches hashing from XXH64 to the md5-prefix
    * scheme ([[hash52]]): any engine with md5 can build, merge and
    * estimate bit-identical sketches (the `field_stats_approx` oracle
    * rebuilds them in DuckDB SQL). The register format is unchanged,
    * so estimate/union code is shared — but don't union sketches
    * built under different hash modes; like mixing seeds, nothing can
    * detect it and the estimate silently degrades. XXH64 stays the
    * default: it's several times faster per value and the 100 TB path
    * doesn't need cross-engine replay. */
  case class HllSketchAgg(child: Expression, p: Int,
                          portable: Boolean = false,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]]
      with org.apache.spark.sql.GraftInputTypes with UnaryLike[Expression] {
    require(p >= 4 && p <= 16, "precision must be in [4, 16]")
    // analysis-time typing: hashOf's supported set, narrowed to
    // string-only in portable mode (md5 needs the canonical string
    // rendering) — SQL misuse fails in the analyzer, not per-row
    override def graftInputTypes: Seq[Seq[DataType]] =
      if (portable) Seq(Seq(StringType))
      else Seq(Seq(LongType, IntegerType, StringType, DoubleType))
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)
    override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
      val v = child.eval(row)
      if (v != null) {
        if (portable) addHash52(buf, p, hash52(v, child.dataType))
        else addHash(buf, p, hashOf(v, child.dataType))
      }
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = maxMerge(a, b)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(storage: Array[Byte]): Array[Byte] = storage
    override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
      copy(child = newChild)
  }

  /** Union previously-built sketches (binary column). */
  case class HllUnionAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray
    override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
      child.eval(row) match {
        case null => buf
        case b: Array[Byte] =>
          if (buf.isEmpty) b.clone() else maxMerge(buf, b)
      }
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b else if (b.isEmpty) a else maxMerge(a, b)
    override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(storage: Array[Byte]): Array[Byte] = storage
    override def withNewMutableAggBufferOffset(o: Int): HllUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllUnionAgg =
      copy(child = newChild)
  }

  /** Distinct-count estimate of a sketch (scalar). */
  case class HllEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // -- Column API ------------------------------------------------------

  private def e(c: Column) = GraftBridge.expression(c)
  private def agg(a: TypedImperativeAggregate[Array[Byte]]): Column =
    GraftBridge.column(a.toAggregateExpression())

  def hllSketch(c: Column, p: Int = 12, portable: Boolean = false): Column =
    agg(HllSketchAgg(e(c), p, portable))
  def hllUnion(c: Column): Column = agg(HllUnionAgg(e(c)))
  def hllEstimate(c: Column): Column = GraftBridge.column(HllEstimate(e(c)))
}
