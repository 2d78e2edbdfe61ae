package graft

/**
 * Physical-plan assertions for the catalog queries whose 100 TB
 * behavior hinges on a plan property (not just a correct answer).
 */
class QueriesPlanSpec extends SparkSpecBase {

  test("pipeline_docs never shuffles raw document text as a partition key") {
    val plan = Queries.pipelineDocs(spark, sf())
      .queryExecution.executedPlan.toString
    // the exact-dedup window must partition on the md5 fingerprint,
    // never on the text column itself
    assert(!plan.contains("hashpartitioning(text#"),
      s"raw text used as a shuffle key:\n$plan")
    assert(plan.contains("md5"), s"expected fingerprint key in plan:\n$plan")
  }

  test("ngram jaccard candidate join carries the length + positional bounds") {
    val plan = Queries.dedupNgramJaccard(spark, sf())
      .queryExecution.optimizedPlan.toString
    // the mutual size bound and the max-overlap bound are join-side
    assert(plan.contains("sz"), s"expected size columns in join:\n$plan")
    assert(plan.contains("least"), s"expected positional bound in join:\n$plan")
  }

  test("q3_revenue_salted actually salts: the fact-dim exchange keys on (join key, salt)") {
    val plan = Queries.q3RevenueSalted(spark, sf())
      .queryExecution.executedPlan.toString
    // the join must key on BOTH the key and the salt column — a plan
    // that dropped the salt would re-concentrate the hot key on one
    // reducer (shuffle-join regime) and silently defeat the operator.
    // At this SF AQE broadcasts the dim side, so assert the JOIN KEYS
    // (present in either join flavor), not the exchange.
    assert("Join \\[l_orderkey#\\d+L?, __graft_salt".r
      .findFirstIn(plan).isDefined,
      s"expected (l_orderkey, __graft_salt) join keys:\n$plan")
  }

  test("field_stats pushes only the projected columns to the scan") {
    val plan = Queries.fieldStatsQ(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_comment"),
      s"scan reads columns the query never touches:\n$plan")
  }

  test("fieldStats exact path size-switches: split aggregates below the bound, " +
    "Expand + exact countDistinct above — identical exact results") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("a"), (col("id") % 13).as("b"))
    def stats(bound: String) = {
      spark.conf.set(operators.StatsOp.SplitDistinctMaxBytesConf, bound)
      try operators.StatsOp.fieldStats(df, Seq("a", "b"),
        approxDistinct = Some(false))
      finally spark.conf.unset(operators.StatsOp.SplitDistinctMaxBytesConf)
    }
    val small = stats("1g") // under the bound: per-field split aggregates
    assert(!small.queryExecution.executedPlan.toString.contains("Expand"),
      "split path must not plan the multi-distinct Expand")
    val big = stats("1") // over the bound: single-pass Expand plan
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("Expand"),
      s"above the bound the exact path must keep the one-scan Expand plan:\n$bigPlan")
    assert(!bigPlan.contains("approx_count_distinct"),
      s"the exact path must never fall back to approximate counting:\n$bigPlan")
    val render = (d: org.apache.spark.sql.DataFrame) =>
      d.orderBy("field").collect().map(_.toString).toSeq
    assert(render(small) == render(big),
      "split and Expand plans must produce identical exact stats")
    val dc = small.orderBy("field").select("distinct_count")
      .collect().map(_.getLong(0)).toSeq
    assert(dc == Seq(7L, 13L), s"exact distincts wrong: $dc")
  }

  test("field_stats_approx runs the HLL branch: no exact-distinct Expand, bounded error") {
    val df = Queries.fieldStatsApproxQ(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // the catalog entry runs the PORTABLE sketch (md5-hashed, so the
    // DuckDB oracle can replay the registers); still one HLL pass
    assert(plan.contains("hllsketchagg"),
      s"approx entry must aggregate with HyperLogLog:\n$plan")
    // exact multi-column countDistinct plans via Expand (rows × fields);
    // the scale branch must stay a single pass
    assert(!plan.contains("Expand"),
      s"HLL branch must not pay the exact-distinct Expand:\n$plan")
    // estimates within HLL's default rsd (5%) ± slack of the exact counts
    val exact = Queries.fieldStatsQ(spark, sf()).select("field", "distinct_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.select("field", "distinct_count").collect().foreach { r =>
      val (f, est) = (r.getString(0), r.getLong(1))
      val ex = exact(f).toDouble
      assert(math.abs(est - ex) / ex <= 0.15,
        s"$f: HLL estimate $est too far from exact ${exact(f)}")
    }
  }

  test("bm25: term stats broadcast; the only cross join is the 1-row corpus stats") {
    val plan = Queries.searchBm25(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-term df must broadcast into the hits frame:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must never cartesian-join the corpus:\n$plan")
    graft.operators.OpCache.releaseAll()
  }

  test("sqrt mix: corpus side joins broadcast stats without shuffling itself") {
    val plan = Queries.mixSqrt(spark, sf())
      .queryExecution.executedPlan.toString
    // the only exchanges allowed are on the tiny counts/min frames —
    // the documents scan itself must feed the join directly
    assert(plan.contains("BroadcastHashJoin"), s"counts must broadcast:\n$plan")
    val scanToJoin = plan.linesIterator
      .dropWhile(l => !l.contains("BroadcastHashJoin")).take(40).mkString("\n")
    assert(!scanToJoin.contains("Exchange hashpartitioning(doc_id"),
      s"corpus must not shuffle for the mix filter:\n$plan")
  }

  test("pipeline v3: thresholds/caps broadcast or hash-join, never cartesian") {
    val plan = Queries.pipelineDocsV3(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"composed pipeline must never cartesian-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source thresholds and the frequent-line set must broadcast:\n$plan")
    // raw decorated text must never be a shuffle key (md5 keys only)
    assert(!plan.contains("hashpartitioning(text,")
      && !plan.contains("hashpartitioning(text#"),
      s"raw text must not key a shuffle:\n$plan")
  }

  test("contamination: benchmark n-gram set broadcasts into the hits join") {
    val plan = Queries.contaminationQ(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench set must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"contamination must never cartesian-join:\n$plan")
    graft.operators.OpCache.releaseAll()
  }
}
