package graft

import graft.operators.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    (1L, ts("2026-01-01 10:00:00"), 100.0),
    (1L, ts("2026-01-01 10:05:00"), 101.0),
    (2L, ts("2026-01-01 10:02:00"), 50.0)).toDF("sym", "qts", "price")

  private def trades = Seq(
    (1L, ts("2026-01-01 10:03:00"), "t1"),   // → 10:00 quote (100.0)
    (1L, ts("2026-01-01 10:05:00"), "t2"),   // equal ts → inclusive (101.0)
    (1L, ts("2026-01-01 09:59:00"), "t3"),   // before any quote → null
    (2L, ts("2026-01-01 11:00:00"), "t4"),   // → 50.0
    (3L, ts("2026-01-01 10:00:00"), "t5")).  // key with no quotes → null
    toDF("sym", "tts", "trade_id")

  test("as-of join: latest-at-or-before semantics, nulls for no match") {
    val out = AsOf.join(trades, quotes,
        leftTs = "tts", rightTs = "qts",
        leftKeys = Seq("sym"), rightKeys = Seq("sym"))
      .select("trade_id", "price").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> None,
      "t4" -> Some(50.0), "t5" -> None))
  }

  test("as-of join keeps every left row exactly once") {
    val out = AsOf.join(trades, quotes, "tts", "qts", Seq("sym"), Seq("sym"))
    assert(out.count() === trades.count())
    // default carry: right columns minus keys and ts
    assert(out.columns.toSeq === Seq("sym", "tts", "trade_id", "price"))
  }

  test("as-of join plans at most one shuffle (union trick, no pair blowup)") {
    // on real (parquet) inputs this is exactly 1 key-shuffle; tiny
    // local relations collapse it to a local sort (0)
    val events = graft.sources.Readers.table(spark, sf(), "events")
      .select("event_id", "user_id", "ts")
    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice")
    val out = AsOf.join(events, orders, "ts", "o_orderdate",
      Seq("user_id"), Seq("o_custkey"), rightCols = Seq("o_totalprice"))
    // AdaptiveSparkPlanExec hides its children from collect(); count
    // exchanges in the rendered plan instead
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected 1 shuffle:\n$plan")
    assert(out.count() === events.count())
  }
}
