package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, GraftInputTypes}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/**
 * MERGEABLE Count-Min sketches as first-class values (Cormode &
 * Muthukrishnan '05) — the frequency-estimation member of graft's
 * sketch family (HLL = distinct counts, DDSketch = quantiles, CMS =
 * heavy hitters). The 100 TB question it answers incrementally:
 * "how often does this token / domain / url appear", per day,
 * persisted, then unioned over any window without rescanning — the
 * primitive behind streaming heavy-hitter detection, frequency-based
 * vocab pruning, and hot-key diagnosis on live pipelines.
 *
 *   cms_sketch(col[, d, w]) → binary (d×w long counters) per group
 *   cms_union(sketch)       → binary — merge previously-built sketches
 *   cms_estimate(sketch, v) → bigint — frequency upper bound for v
 *
 * Counter matrices are ADDED element-wise, so sketches are
 * associative and commutative — bit-for-bit partitioning-invariant
 * (exact integer adds, no float drift). Estimates are one-sided:
 * never below the true count, above by at most εN (ε ≈ e/w) with
 * probability 1−δ (δ ≈ e^−d). Hashing is Spark's own XXH64 with one
 * seed per row of the matrix — stable across runs and engines.
 */
object CmsExprs {

  private val Seed = 42L
  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** The key types [[hashOf]] supports — enforced at ANALYSIS time via
    * ExpectsInputTypes so SQL-registry misuse (wrong probe type, non-
    * binary sketch arg) fails in the analyzer, not at runtime. */
  private val KeyTypes: Seq[DataType] =
    Seq(LongType, IntegerType, StringType, DoubleType)

  private[functions] def hashOf(v: Any, dt: DataType, seed: Long): Long = dt match {
    case LongType => XXH64.hashLong(v.asInstanceOf[Long], seed)
    case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, seed)
    case StringType =>
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
    case DoubleType =>
      XXH64.hashLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), seed)
    case other => throw new IllegalArgumentException(
      s"cms_sketch: unsupported input type $other")
  }

  /** Sketch = header (depth, width as ints) + d·w long counters. */
  final class Cms(val depth: Int, val width: Int,
                  val counters: Array[Long]) {
    def add(v: Any, dt: DataType): Unit = {
      var i = 0
      while (i < depth) {
        val h = hashOf(v, dt, Seed + i)
        counters(i * width + ((h & Long.MaxValue) % width).toInt) += 1L
        i += 1
      }
    }
    def estimate(v: Any, dt: DataType): Long = {
      var min = Long.MaxValue
      var i = 0
      while (i < depth) {
        val h = hashOf(v, dt, Seed + i)
        val c = counters(i * width + ((h & Long.MaxValue) % width).toInt)
        if (c < min) min = c
        i += 1
      }
      min
    }
    // PORTABLE row buckets: Kirsch-Mitzenmacher double hashing over
    // the two 52-bit md5 prefixes — (h1 + i·h2) < 2^56 stays exact in
    // a signed 64-bit int on every engine, so the whole sketch is
    // pure integer arithmetic any SQL dialect can replay
    def addPortable(v: Any, dt: DataType): Unit = {
      val (h1, h2) = HllExprs.md5Pair(v, dt)
      var i = 0
      while (i < depth) {
        counters(i * width + ((h1 + i * h2) % width).toInt) += 1L
        i += 1
      }
    }
    def estimatePortable(v: Any, dt: DataType): Long = {
      val (h1, h2) = HllExprs.md5Pair(v, dt)
      var min = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = counters(i * width + ((h1 + i * h2) % width).toInt)
        if (c < min) min = c
        i += 1
      }
      min
    }
    def addAll(o: Cms): Cms = {
      require(o.depth == depth && o.width == width,
        s"cannot union CMS of different shapes (${depth}x$width vs ${o.depth}x${o.width})")
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
      this
    }
    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + counters.length * 8)
      bb.putInt(depth).putInt(width)
      var i = 0
      while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
      bb.array()
    }
  }

  private[functions] def fromBytes(b: Array[Byte]): Cms = {
    // the header of an arbitrary binary input is untrusted: validate
    // shape bounds (same [1,16]/[16,2^24] as the agg) and that the
    // payload length matches BEFORE allocating d*w counters, so a
    // corrupt / non-sketch value fails loudly instead of throwing
    // NegativeArraySizeException or allocating gigabytes
    require(b.length >= 8, s"not a CMS sketch: ${b.length} bytes, need >= 8 header bytes")
    val bb = java.nio.ByteBuffer.wrap(b)
    val d = bb.getInt
    val w = bb.getInt
    require(d >= 1 && d <= 16 && w >= 16 && w <= (1 << 24),
      s"not a CMS sketch: header says depth=$d width=$w, outside [1,16]x[16,2^24]")
    require(b.length == 8 + d.toLong * w * 8,
      s"not a CMS sketch: ${b.length} bytes for claimed ${d}x$w (need ${8 + d.toLong * w * 8})")
    val c = new Array[Long](d * w)
    var i = 0
    while (i < c.length) { c(i) = bb.getLong; i += 1 }
    new Cms(d, w, c)
  }

  /** Build a sketch from raw values. `portable = true` swaps XXH64
    * for the md5-prefix double-hash scheme (string input only, cast
    * first): any md5-capable engine can rebuild the counters exactly —
    * the same portability trade as HllSketchAgg's portable mode, and
    * what earns `skew_keys_approx` its full oracle. Counter layout is
    * unchanged; union and join-size work on either (they never hash),
    * but estimate must use the same mode the sketch was built with. */
  case class CmsSketchAgg(child: Expression, depth: Int, width: Int,
                          portable: Boolean = false,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Cms] with GraftInputTypes
      with UnaryLike[Expression] {
    require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
    require(width >= 16 && width <= (1 << 24), "width must be in [16, 2^24]")
    // portable hashing is string-only — enforce in the ANALYZER, not
    // per-row mid-job (the same contract the non-portable KeyTypes
    // check exists for)
    override def graftInputTypes: Seq[Seq[DataType]] =
      if (portable) Seq(Seq(StringType)) else Seq(KeyTypes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Cms =
      new Cms(depth, width, new Array[Long](depth * width))
    override def update(buf: Cms, row: InternalRow): Cms = {
      val v = child.eval(row)
      if (v != null) {
        if (portable) buf.addPortable(v, child.dataType)
        else buf.add(v, child.dataType)
      }
      buf
    }
    override def merge(a: Cms, b: Cms): Cms = a.addAll(b)
    override def eval(buf: Cms): Any = buf.toBytes
    override def serialize(buf: Cms): Array[Byte] = buf.toBytes
    override def deserialize(storage: Array[Byte]): Cms = fromBytes(storage)
    override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
      copy(child = newChild)
  }

  /** Union previously-built sketches (binary column). */
  case class CmsUnionAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Option[Cms]] with GraftInputTypes
      with UnaryLike[Expression] {
    override def graftInputTypes: Seq[Seq[DataType]] = Seq(Seq(BinaryType))
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def createAggregationBuffer(): Option[Cms] = None
    override def update(buf: Option[Cms], row: InternalRow): Option[Cms] =
      child.eval(row) match {
        case null => buf
        case b: Array[Byte] =>
          val in = fromBytes(b)
          buf match {
            case None => Some(in)
            case Some(acc) => Some(acc.addAll(in))
          }
      }
    override def merge(a: Option[Cms], b: Option[Cms]): Option[Cms] = (a, b) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(x), Some(y)) => Some(x.addAll(y))
    }
    override def eval(buf: Option[Cms]): Any = buf.map(_.toBytes).orNull
    override def serialize(buf: Option[Cms]): Array[Byte] =
      buf.map(_.toBytes).getOrElse(Array.emptyByteArray)
    override def deserialize(storage: Array[Byte]): Option[Cms] =
      if (storage.isEmpty) None else Some(fromBytes(storage))
    override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
      copy(child = newChild)
  }

  /**
   * JOIN-SIZE estimate from two sketches (Cormode & Muthukrishnan
   * '05 §4.2): the equi-join row count |A ⋈ B| on the sketched key
   * is Σ_v f_A(v)·f_B(v), estimated as min over rows d of
   * Σ_j a[d][j]·b[d][j] — one-sided (never under the true size,
   * over by at most ε·N_A·N_B w.h.p.). The pre-flight diagnostic a
   * planner wants before committing to a shuffle: two KB-sized
   * sketches answer "how big is this join" without touching either
   * table again.
   */
  case class CmsJoinSize(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback with GraftInputTypes
      with BinaryLike[Expression] {
    override def graftInputTypes: Seq[Seq[DataType]] = Seq(Seq(BinaryType), Seq(BinaryType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = fromBytes(a.asInstanceOf[Array[Byte]])
      val y = fromBytes(b.asInstanceOf[Array[Byte]])
      require(x.depth == y.depth && x.width == y.width,
        s"cannot estimate join size across CMS shapes " +
          s"(${x.depth}x${x.width} vs ${y.depth}x${y.width})")
      var min = Long.MaxValue
      var d = 0
      while (d < x.depth) {
        // counters scale ~N/width, so the inner product is ~N²/width and
        // CAN exceed Long at the corpus sizes this targets — detect with
        // multiplyHigh/sign checks and saturate the row to Long.MaxValue
        // (a saturated row simply can't become the min) rather than
        // silently wrapping negative and breaking the one-sided bound
        var s = 0L
        var overflow = false
        var j = 0
        while (j < x.width && !overflow) {
          val a = x.counters(d * x.width + j)
          val b = y.counters(d * y.width + j)
          if (a != 0L && b != 0L) {
            val lo = a * b
            if (Math.multiplyHigh(a, b) != 0L || lo < 0L) overflow = true
            else {
              s += lo
              if (s < 0L) overflow = true // both addends >= 0: wrap is the only way negative
            }
          }
          j += 1
        }
        if (!overflow && s < min) min = s
        d += 1
      }
      min
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Frequency upper bound of `value` in a sketch (scalar).
    * `portable` must match the mode the sketch was built with. */
  case class CmsEstimate(left: Expression, right: Expression,
                         portable: Boolean = false)
      extends BinaryExpression with CodegenFallback with GraftInputTypes
      with BinaryLike[Expression] {
    override def graftInputTypes: Seq[Seq[DataType]] =
      Seq(Seq(BinaryType), if (portable) Seq(StringType) else KeyTypes)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(sketch: Any, v: Any): Any = {
      val cms = fromBytes(sketch.asInstanceOf[Array[Byte]])
      if (portable) cms.estimatePortable(v, right.dataType)
      else cms.estimate(v, right.dataType)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // -- Column API ------------------------------------------------------

  private def e(c: Column) = GraftBridge.expression(c)
  private def agg(a: TypedImperativeAggregate[_]): Column =
    GraftBridge.column(a.toAggregateExpression())

  def cmsSketch(c: Column, depth: Int = DefaultDepth,
                width: Int = DefaultWidth, portable: Boolean = false): Column =
    agg(CmsSketchAgg(e(c), depth, width, portable))
  def cmsUnion(c: Column): Column = agg(CmsUnionAgg(e(c)))
  def cmsEstimate(sketch: Column, value: Column,
                  portable: Boolean = false): Column =
    GraftBridge.column(CmsEstimate(e(sketch), e(value), portable))
  def cmsJoinSize(a: Column, b: Column): Column =
    GraftBridge.column(CmsJoinSize(e(a), e(b)))
}
