package graft

import graft.operators.{Graph, Versioning}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GraphScd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2: runs collapse, ranges chain, ties break on the tie column, null attrs are null-safe") {
    val ev = Seq(
      (1L, ts("2026-01-01 00:00:00"), 10L, Some("free")),
      (1L, ts("2026-01-02 00:00:00"), 11L, Some("free")), // re-delivery: no new version
      (1L, ts("2026-01-03 00:00:00"), 12L, Some("pro")),
      (1L, ts("2026-01-04 00:00:00"), 13L, Some("free")), // back: a THIRD version
      (2L, ts("2026-01-01 00:00:00"), 20L, None),         // null attr opens v1
      (2L, ts("2026-01-02 00:00:00"), 21L, None),         // null == null: collapses
      (2L, ts("2026-01-03 00:00:00"), 22L, Some("pro")),
      // same-ts tie on user 3: event_id orders 30 before 31
      (3L, ts("2026-01-01 00:00:00"), 31L, Some("b")),
      (3L, ts("2026-01-01 00:00:00"), 30L, Some("a")))
      .toDF("user_id", "ts", "event_id", "plan")
    val out = Versioning.scd2(ev, col("user_id"), col("ts"), col("plan"),
        col("event_id"))
      .as[(Long, Option[String], Timestamp, Option[Timestamp], Boolean, Int)]
      .collect().toSet
    assert(out == Set(
      (1L, Some("free"), ts("2026-01-01 00:00:00"), Some(ts("2026-01-03 00:00:00")), false, 1),
      (1L, Some("pro"), ts("2026-01-03 00:00:00"), Some(ts("2026-01-04 00:00:00")), false, 2),
      (1L, Some("free"), ts("2026-01-04 00:00:00"), None, true, 3),
      (2L, None, ts("2026-01-01 00:00:00"), Some(ts("2026-01-03 00:00:00")), false, 1),
      (2L, Some("pro"), ts("2026-01-03 00:00:00"), None, true, 2),
      (3L, Some("a"), ts("2026-01-01 00:00:00"), Some(ts("2026-01-01 00:00:00")), false, 1),
      (3L, Some("b"), ts("2026-01-01 00:00:00"), None, true, 2)), s"got $out")
  }

  test("scd2Apply == full recompute at every split point: collapse across the boundary, new keys, untouched keys") {
    val ev = Seq(
      (1L, ts("2026-01-01 00:00:00"), 10L, "free"),
      (1L, ts("2026-01-02 00:00:00"), 11L, "free"),  // collapses across any split
      (1L, ts("2026-01-03 00:00:00"), 12L, "pro"),
      (1L, ts("2026-01-04 00:00:00"), 13L, "free"),
      (2L, ts("2026-01-01 00:00:00"), 20L, "a"),     // untouched when split late
      (3L, ts("2026-01-05 00:00:00"), 30L, "x"))     // new key in late batches
      .toDF("user_id", "ts", "event_id", "plan")
    def history(df: org.apache.spark.sql.DataFrame) =
      Versioning.scd2(df, col("user_id"), col("ts"), col("plan"),
        col("event_id"))
    val full = history(ev)
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Int)]
      .collect().toSet
    for (cut <- Seq("2026-01-01 12:00:00", "2026-01-02 12:00:00",
      "2026-01-03 12:00:00", "2026-01-04 12:00:00")) {
      val existing = history(ev.filter(col("ts") <= lit(ts(cut))))
      val applied = Versioning.scd2Apply(existing,
        ev.filter(col("ts") > lit(ts(cut))),
        col("user_id"), col("ts"), col("plan"), col("event_id"))
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Int)]
        .collect().toSet
      assert(applied == full, s"split at $cut diverged")
    }
  }

  test("scd2Apply Int tie column: derived floor keeps the open version the run's opener even vs negative batch ties") {
    // tie is Int — a Long.MinValue floor cast non-ANSI would wrap to 0
    // and let the same-timestamp batch event (tie -3 < 0) sort BEFORE
    // the replayed open version, flipping which attr ends up current
    val t1 = ts("2026-01-01 00:00:00")
    val existing = Versioning.scd2(
      Seq((1L, t1, 5, "free")).toDF("user_id", "ts", "event_id", "plan"),
      col("user_id"), col("ts"), col("plan"), col("event_id"))
    val applied = Versioning.scd2Apply(existing,
      Seq((1L, t1, -3, "pro")).toDF("user_id", "ts", "event_id", "plan"),
      col("user_id"), col("ts"), col("plan"), col("event_id"))
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Int)]
      .collect().toSet
    assert(applied == Set(
      (1L, "free", t1, Some(t1), false, 1),
      (1L, "pro", t1, None, true, 2)), s"got $applied")
    // non-numeric tie types have no derivable floor: explicit or error
    intercept[IllegalArgumentException] {
      Versioning.scd2Apply(existing,
        Seq((1L, t1, "a", "pro")).toDF("user_id", "ts", "event_id", "plan"),
        col("user_id"), col("ts"), col("plan"), col("event_id"))
    }
  }

  test("pageRank early-exit: a regular graph hits its integer fixed point after one iteration") {
    // undirected 6-ring: every node deg 2, in-deg 2 — rank stays at
    // `scale` from the very first iteration (t = 2·(scale div 2) =
    // scale → 0.15·scale + 0.85·scale), so the exact-fixed-point mode
    // (convergeL1 = 0) must stop after iteration 1 with ranks
    // bit-identical to the full 5-iteration unroll
    val ring = (0 until 6).map(i => (s"n$i", s"n${(i + 1) % 6}"))
    val edges = (ring ++ ring.map(_.swap)).toDF("src", "dst")
    val (fast, ran) = Graph.pageRankConverged(edges, iterations = 5, convergeL1 = 0L)
    assert(ran === 1, s"regular graph must converge after 1 iteration, ran $ran")
    val full = Graph.pageRank(edges, iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(fast.as[(String, Long)].collect().toMap === full,
      "early exit may only skip proven no-op iterations")
    // a non-regular graph does NOT hit the exact fixed point in 2:
    // the disabled mode and the exact mode still agree at the cap
    val star = Seq(("a", "hub"), ("b", "hub"), ("hub", "a"), ("hub", "b"),
      ("c", "a"), ("a", "c")).toDF("src", "dst")
    val (exact, ran2) = Graph.pageRankConverged(star, iterations = 4, convergeL1 = 0L)
    val plain = Graph.pageRank(star, iterations = 4)
      .as[(String, Long)].collect().toMap
    assert(exact.as[(String, Long)].collect().toMap === plain, s"ran2=$ran2")
    graft.operators.OpCache.releaseAll()
  }

  test("pageRank matches an independent integer-arithmetic model; partitioning-invariant") {
    // small directed graph made undirected, with a clear hub
    val raw = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "d"),
      ("b", "c"))
    val edges = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 5)
      .as[(String, Long)].collect().toMap

    // reference model: same fixed-point rules, plain Scala maps
    val e = (raw ++ raw.map(_.swap)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = e.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to 5).foreach { _ =>
      val t = e.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n -> (150000L + (85L * t.getOrElse(n, 0L)) / 100L)).toMap
    }
    assert(got == r, s"got $got want $r")
    assert(got("hub") > got("a") && got("hub") > got("d"),
      "the hub must outrank leaves")
    val shuffled = Graph.pageRank(edges.repartition(7), iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(shuffled == got, "fixed-point ranks must be partitioning-invariant")
    graft.operators.OpCache.releaseAll()
  }
}
