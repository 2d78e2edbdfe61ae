package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  test("funnel stages: ordered matching only; furthest stage wins") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), // full
      (2L, 1L, "click"), (2L, 2L, "view"),      // click BEFORE view → 1
      (3L, 5L, "view"), (3L, 6L, "purchase"),   // skipped click → 1
      (4L, 9L, "error"))                        // never starts → 0
      .toDF("user_id", "event_id", "event_type")
    val out = Funnel.stages(ev, col("user_id"), col("event_id"),
        col("event_type"), Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("funnel counts include stage-0 users; re-walking a step needs a later ord") {
    val ev = Seq(
      // user 5: view(4) click(2) — the click precedes the FIRST view,
      // but a later click(6) rescues stage 2
      (5L, 4L, "view"), (5L, 2L, "click"), (5L, 6L, "click"))
      .toDF("user_id", "event_id", "event_type")
    val out = Funnel.stages(ev, col("user_id"), col("event_id"),
        col("event_type"), Seq("view", "click"))
      .as[(Long, Int)].collect().toMap
    assert(out === Map(5L -> 2))
  }

  test("cohort retention: week 0 contains every cohort member") {
    val events = graft.sources.Readers.table(spark, sf("sf0.001"), "events")
    val ret = Funnel.cohortRetention(events, col("user_id"), col("ts"),
      col("event_type"), "signup")
    val byCohort = ret.groupBy("cohort_week")
      .agg(max(when(col("week_offset") === 0, col("n_active"))).as("w0"))
      .select("w0").as[Long].collect()
    // every signup cohort has at least its own members active in week 0
    assert(byCohort.forall(_ > 0))
  }
}
