package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, GraftInputTypes}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/**
 * BOUNDED-HEAP TOP-K selection — the aggregate that replaces
 * `row_number() OVER (PARTITION BY query ORDER BY score)` in every
 * ANN serve path. The window form materializes and SORTS the whole
 * candidate frame (n·m rows for brute force, n·nprobe·cell for IVF):
 * at sf1 that sort spilled ~630 MB per ANN entry (planaudit r6/r7),
 * and at 100 TB it is THE bottleneck — a full sort of a frame that
 * only ever yields k rows per query. A TypedImperativeAggregate with
 * a k-bounded heap per query partial-aggregates MAP-SIDE: each task
 * reduces its candidates to ≤k rows per query before the exchange,
 * the shuffle carries k-sized heaps instead of candidate rows, and
 * nothing sorts anything larger than k. Selection semantics are
 * IDENTICAL to the window form (ties broken by neighbor id
 * ascending), so the DuckDB oracles are unchanged.
 *
 * `distinctIds` folds an upstream `.distinct()` into the heap (LSH
 * candidates arrive once per colliding table): duplicates carry
 * identical scores, so id-dedup inside insert/merge is exactly
 * `distinct` + top-k — without a second exchange for the distinct.
 */
object TopKExprs {

  /** Bounded top-k buffer: a binary MIN-heap of (id, score) keyed by
    * "worseness" — root is the worst kept entry, so a better arrival
    * replaces the root in O(log k). `bigBetter` = true ranks higher
    * scores first (cosine); false ranks lower first (distance). */
  final class TopKBuf(val k: Int, val bigBetter: Boolean,
                      val distinctIds: Boolean) {
    val ids = new Array[Long](k)
    val scores = new Array[Double](k)
    var n = 0

    /** entry (s1,i1) strictly worse than (s2,i2) under the ranking
      * (score best-first, id asc on ties). */
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      if (s1 != s2) { if (bigBetter) s1 < s2 else s1 > s2 }
      else i1 > i2

    private def swap(a: Int, b: Int): Unit = {
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }

    def insert(id: Long, score: Double): Unit = {
      if (distinctIds) {
        var i = 0
        while (i < n) { if (ids(i) == id) return; i += 1 }
      }
      if (n < k) {
        ids(n) = id; scores(n) = score; n += 1; siftUp(n - 1)
      } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
        ids(0) = id; scores(0) = score; siftDown()
      }
    }

    def mergeFrom(o: TopKBuf): TopKBuf = {
      var i = 0
      while (i < o.n) { insert(o.ids(i), o.scores(i)); i += 1 }
      this
    }

    /** (id, score) pairs sorted best-first — rank i+1. */
    def sorted: Array[(Long, Double)] = {
      val idx = Array.range(0, n).sortWith { (a, b) =>
        worse(scores(b), ids(b), scores(a), ids(a))
      }
      idx.map(i => (ids(i), scores(i)))
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 1 + 1 + 4 + n * 16)
      bb.putInt(k)
      bb.put(if (bigBetter) 1.toByte else 0.toByte)
      bb.put(if (distinctIds) 1.toByte else 0.toByte)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
      bb.array()
    }
  }

  def fromBytes(b: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(b)
    val buf = new TopKBuf(bb.getInt, bb.get() == 1, bb.get() == 1)
    val m = bb.getInt
    var i = 0
    // entries arrive from a valid heap; re-inserting preserves it
    while (i < m) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  /**
   * agg: top-k (neighbor id, score) pairs per group, returned as
   * `array<struct<neighbor_id, scoreName>>` sorted best-first
   * (element i has rank i+1). Map-side partial aggregation bounds
   * every task at k entries per group — no candidate-frame sort, no
   * spill, shuffle payload k·16 bytes per (group, task).
   */
  case class TopKPairsAgg(idChild: Expression, scoreChild: Expression,
                          k: Int, bigBetter: Boolean, distinctIds: Boolean,
                          scoreName: String,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuf] with GraftInputTypes
      with BinaryLike[Expression] {
    require(k >= 1 && k <= 65536, "k must be in [1, 65536]")
    override def left: Expression = idChild
    override def right: Expression = scoreChild
    override def graftInputTypes: Seq[Seq[DataType]] =
      Seq(Seq(LongType, IntegerType), Seq(DoubleType, FloatType))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("neighbor_id", idChild.dataType, nullable = false),
      StructField(scoreName, DoubleType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): TopKBuf =
      new TopKBuf(k, bigBetter, distinctIds)
    override def update(buf: TopKBuf, row: InternalRow): TopKBuf = {
      val idv = idChild.eval(row)
      val sv = scoreChild.eval(row)
      if (idv != null && sv != null) {
        val id = idv match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
        val s = sv match {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.doubleValue()
        }
        buf.insert(id, s)
      }
      buf
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = a.mergeFrom(b)
    override def eval(buf: TopKBuf): Any = {
      val intId = idChild.dataType == IntegerType
      new GenericArrayData(buf.sorted.map { case (id, s) =>
        new GenericInternalRow(Array[Any](
          if (intId) id.toInt else id, s)): Any
      })
    }
    override def serialize(buf: TopKBuf): Array[Byte] = buf.toBytes
    override def deserialize(storage: Array[Byte]): TopKBuf = fromBytes(storage)
    override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKPairsAgg =
      copy(idChild = newLeft, scoreChild = newRight)
  }

  private def e(c: Column) = GraftBridge.expression(c)

  /** Top-k neighbors per group by descending similarity. */
  def topKBySim(id: Column, sim: Column, k: Int,
                distinctIds: Boolean = false,
                scoreName: String = "cos_sim"): Column =
    GraftBridge.column(TopKPairsAgg(e(id), e(sim), k, bigBetter = true,
      distinctIds = distinctIds, scoreName = scoreName).toAggregateExpression())

  /** Top-k neighbors per group by ascending distance. */
  def topKByDist(id: Column, dist: Column, k: Int,
                 distinctIds: Boolean = false,
                 scoreName: String = "adc_dist"): Column =
    GraftBridge.column(TopKPairsAgg(e(id), e(dist), k, bigBetter = false,
      distinctIds = distinctIds, scoreName = scoreName).toAggregateExpression())
}
