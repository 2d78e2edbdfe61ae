package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalJoin == naive theta join; half-open boundaries") {
    val points = Seq(
      (1L, 10L, ts("2026-01-05 00:00:00")),
      (2L, 10L, ts("2026-01-07 00:00:00")),   // exactly at an end → excluded
      (3L, 10L, ts("2026-01-03 00:00:00")),   // exactly at a start → included
      (4L, 20L, ts("2026-01-05 00:00:00")),   // other key
      (5L, 10L, ts("2026-02-01 00:00:00")))   // outside everything
      .toDF("pid", "k", "pts")
    val intervals = Seq(
      (100L, 10L, ts("2026-01-03 00:00:00"), ts("2026-01-07 00:00:00")),
      (101L, 10L, ts("2026-01-04 12:00:00"), ts("2026-01-05 12:00:00")),
      (102L, 20L, ts("2026-01-01 00:00:00"), ts("2026-01-31 00:00:00")))
      .toDF("iid", "k", "start_ts", "end_ts")

    val bucketed = RangeJoin.intervalJoin(points, intervals,
        "pts", "start_ts", "end_ts", Seq("k"), Seq("k"), bucketSeconds = 24 * 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("pts") >= col("start_ts") && col("pts") < col("end_ts"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed === Set((1L, 100L), (1L, 101L), (3L, 100L), (4L, 102L)))
  }

  test("intervalJoin emits no duplicate pairs for multi-bucket intervals") {
    val points = Seq((1L, 1L, ts("2026-01-15 00:00:00"))).toDF("pid", "k", "pts")
    // 29-day interval covers many 1-day buckets
    val intervals = Seq((9L, 1L, ts("2026-01-01 00:00:00"), ts("2026-01-30 00:00:00")))
      .toDF("iid", "k", "start_ts", "end_ts")
    val out = RangeJoin.intervalJoin(points, intervals,
      "pts", "start_ts", "end_ts", Seq("k"), Seq("k"), bucketSeconds = 24 * 3600)
    assert(out.count() === 1)
  }

  test("intervalJoin plans a hash join, not a nested loop") {
    val events = graft.sources.Readers.table(spark, sf(), "events")
      .select("event_id", "user_id", "ts")
    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("e"))
    val out = RangeJoin.intervalJoin(events, orders, "ts", "s", "e",
      Seq("user_id"), Seq("o_custkey"), bucketSeconds = 7 * 24 * 3600)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"nested loop in plan:\n$plan")
    assert(plan.contains("Join"), "expected a join")
  }
}
