package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics: FUNNELS (how far does each user get
 * through an ordered step sequence?) and COHORT RETENTION (of the
 * users who started in week W, how many were active in week W+k?).
 * The two workhorse product-analytics queries — and for an LLM-data
 * engine, the shape of any "did doc pass stage A then B then C"
 * audit over pipeline event logs.
 *
 * Scale: every shuffle is keyed by the entity id (user), each step
 * filter pushes to the scan, and step matching is ordinary min/join
 * relational algebra — no per-user driver loops, no UDAF state. A
 * funnel over N steps is N small aggregations of the (already
 * filtered) step events, not N passes over the corpus.
 *
 * Ordering uses an explicit monotone `ord` column (an event id or an
 * epoch) rather than raw timestamps: integer comparisons are exact
 * across engines and timestamp precision conventions.
 */
object Funnel {

  /**
   * Per-user furthest funnel stage: (user, stage) where stage k means
   * the user matched steps 1..k IN ORDER (stage 0 = never did step
   * 1). A later step only counts if its `ord` is strictly after the
   * matched previous step — the standard ordered-funnel semantics.
   */
  def stages(events: DataFrame, user: Column, ord: Column,
             eventType: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(user.as("user_id"), ord.as("ord"),
      eventType.as("event_type"))
    // fold: frame of (user_id, e_k) = first ord reaching step k
    val firsts: Seq[DataFrame] = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val stepEvents = ev.filter(col("event_type") === step)
        val reached = prev match {
          case None => stepEvents
          case Some(p) => stepEvents.join(p, "user_id")
            .filter(col("ord") > col("e"))
            .select(col("user_id"), col("ord"), col("event_type"))
        }
        Some(reached.groupBy("user_id").agg(min(col("ord")).as("e")))
    }.flatten
    val users = ev.select("user_id").distinct()
    val joined = firsts.zipWithIndex.foldLeft(users) { case (acc, (f, i)) =>
      acc.join(f.withColumnRenamed("e", s"e$i"), Seq("user_id"), "left")
    }
    // build outermost-last: the final wrap (highest step) is checked
    // first, so a user counts at their FURTHEST stage
    val stage = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"e$i").isNotNull, lit(i + 1)).otherwise(els)
    }
    joined.select(col("user_id"), stage.cast("int").as("stage"))
  }

  /** Funnel summary: (stage, n_users), stages 0..steps.length. */
  def counts(events: DataFrame, user: Column, ord: Column,
             eventType: Column, steps: Seq[String]): DataFrame =
    stages(events, user, ord, eventType, steps)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))

  /**
   * Weekly COHORT RETENTION: users cohort by the week of their first
   * `cohortType` event; a cohort member is "active in offset k" when
   * they have ANY event in cohort_week + k. Returns (cohort_week
   * DATE, week_offset, n_active) — the retention-curve table.
   * Week boundaries come from `date_trunc('week', …)` (Monday in
   * both Spark and DuckDB); offsets are exact integer day-diffs / 7.
   * Activity BEFORE the first cohort event (possible when cohortType
   * is not the user's first event) is outside the curve's domain and
   * is dropped: offsets are >= 0 by construction.
   */
  def cohortRetention(events: DataFrame, user: Column, ts: Column,
                      eventType: Column, cohortType: String): DataFrame = {
    val ev = events.select(user.as("user_id"), ts.as("ts"),
      eventType.as("event_type"))
    val cohorts = ev.filter(col("event_type") === cohortType)
      .groupBy("user_id").agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cw"))
    val active = ev.select(col("user_id"),
      date_trunc("week", col("ts")).as("aw")).distinct()
    cohorts.join(active, "user_id")
      .select(col("cw"), col("aw"))
      .filter(col("aw") >= col("cw")) // pre-cohort activity: out of domain
      .groupBy(col("cw").cast("date").as("cohort_week"),
        floor(datediff(col("aw"), col("cw")) / 7.0).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
