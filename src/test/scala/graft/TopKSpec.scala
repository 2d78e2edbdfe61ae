package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKExprs

/** The bounded-heap top-k aggregate must select EXACTLY what the
  * window form it replaced selected — same rows, same ranks, same
  * tie-breaks — or every ANN oracle silently drifts. Checked against
  * the row_number() reference on adversarial data: heavy score ties,
  * duplicate ids (LSH multi-table arrivals), groups of size < k,
  * both ranking directions, and across repartitionings (partial
  * heap merge order must not matter). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.session
  import spark.implicits._

  // deterministic pseudo-random candidates: ~40 groups × ~120
  // candidates with only 8 distinct scores → dense tie-breaking.
  // The score is a function of (group, neighbor id) — the LSH/ANN
  // contract distinctIds relies on: a candidate pair re-arriving via
  // another hash table always carries the identical score.
  private def candidates(dups: Boolean) = {
    val rows = (for {
      g <- 0 until 40
      i <- 0 until (60 + (g * 17) % 80)
    } yield {
      val nid = ((g * 131 + i * 7919) % 97).toLong
      val score = ((g * 31 + nid * 53) % 8) / 8.0
      (g.toLong, nid, score)
    }).distinct
    val all = if (dups) rows ++ rows.take(rows.size / 3) else rows
    all.toDF("qid", "neighbor_id", "cos_sim")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int,
                         asc: Boolean, distinct: Boolean) = {
    val base = if (distinct) df.distinct() else df
    val ord = if (asc) Seq(col("cos_sim").asc, col("neighbor_id").asc)
              else Seq(col("cos_sim").desc, col("neighbor_id").asc)
    base.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .filter(col("rank") <= k)
      .select(col("qid").as("id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int,
                       asc: Boolean, distinct: Boolean) = {
    val agg = if (asc)
      TopKExprs.topKByDist(col("neighbor_id"), col("cos_sim"), k, distinct, "cos_sim")
    else
      TopKExprs.topKBySim(col("neighbor_id"), col("cos_sim"), k, distinct, "cos_sim")
    df.groupBy(col("qid")).agg(agg.as("nn"))
      .select(col("qid").as("id"), posexplode(col("nn")))
      .select(col("id"), col("col.neighbor_id").as("neighbor_id"),
        col("col.cos_sim").as("cos_sim"), (col("pos") + 1).cast("int").as("rank"))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
                         k: Int, asc: Boolean, distinct: Boolean): Unit = {
    val w = windowTopK(df, k, asc, distinct).collect().map(_.toSeq).toSet
    val h = heapTopK(df, k, asc, distinct).collect().map(_.toSeq).toSet
    assert(h == w, s"k=$k asc=$asc distinct=$distinct: heap != window")
    assert(w.nonEmpty)
  }

  test("heap == window: both directions, ties broken by id") {
    assertSame(candidates(dups = false), k = 10, asc = false, distinct = false)
    assertSame(candidates(dups = false), k = 10, asc = true, distinct = false)
  }

  test("heap == window: k larger than some groups, k=1 edge") {
    assertSame(candidates(dups = false), k = 1, asc = false, distinct = false)
    assertSame(candidates(dups = false), k = 500, asc = false, distinct = false)
  }

  test("distinctIds folds duplicate candidates like distinct()+window") {
    // duplicate (qid, nid, score) rows — the LSH multi-table shape
    assertSame(candidates(dups = true), k = 10, asc = false, distinct = true)
    assertSame(candidates(dups = true), k = 3, asc = true, distinct = true)
  }

  test("partition layout does not change the result (merge order)") {
    val df = candidates(dups = true)
    val a = heapTopK(df.repartition(1), 7, asc = false, distinct = true)
      .collect().map(_.toSeq).toSet
    val b = heapTopK(df.repartition(13, col("neighbor_id")), 7, asc = false,
        distinct = true).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("SQL registry: topk_by_sim selects what the window selects") {
    graft.functions.GraftFunctions.register(spark)
    candidates(dups = false).createOrReplaceTempView("topk_cand")
    val viaSql = spark.sql(
      """SELECT qid AS id, nn.neighbor_id, nn.cos_sim,
        |       CAST(pos + 1 AS INT) AS rank
        |FROM (SELECT qid, topk_by_sim(neighbor_id, cos_sim, 5) AS arr
        |      FROM topk_cand GROUP BY qid)
        |LATERAL VIEW posexplode(arr) t AS pos, nn""".stripMargin)
      .collect().map(_.toSeq).toSet
    val viaWindow = windowTopK(candidates(dups = false), 5, asc = false,
      distinct = false).collect().map(_.toSeq).toSet
    assert(viaSql == viaWindow)
  }

  test("serialization round-trips a partial heap exactly") {
    val buf = new TopKExprs.TopKBuf(5, true, true)
    Seq((4L, 0.5), (9L, 0.5), (2L, 0.9), (7L, 0.1), (1L, 0.7), (3L, 0.6),
      (2L, 0.9)).foreach { case (i, s) => buf.insert(i, s) }
    val back = TopKExprs.fromBytes(buf.toBytes)
    assert(back.sorted.toSeq == buf.sorted.toSeq)
    assert(back.sorted.head == ((2L, 0.9)))
    // ties rank smaller id first
    assert(back.sorted.map(_._1).toSeq == Seq(2L, 1L, 3L, 4L, 9L))
  }
}
