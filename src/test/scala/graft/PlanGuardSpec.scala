package graft

/**
 * Catalog-wide PLAN REGRESSION GATE: build the physical plan of every
 * SparkEntry query and reject scale anti-patterns — a new query (or a
 * refactor of a shared operator) that introduces a cartesian product
 * or an unpartitioned window fails CI here, not in a 100 TB run.
 */
class PlanGuardSpec extends SparkSpecBase {

  // documented exact/brute-force baselines and windows over provably
  // tiny frames (bounded topK / 256 bucket offsets)
  private val crossJoinAllowed = Set(
    "sim_topk",   // exact ANN baseline: crossJoin(broadcast(q))
    "sim_cross",  // broadcast benchmark side, documented
    "dedup_embedding", // O(n²) documented baseline (lshDupPairs = scale path)
    "dedup_embedding_incremental", // broadcast(batch) cross on the
                                   // catalog's SMALL batch only: the
                                   // operator itself auto-routes to
                                   // banded lshCrossPairs once the
                                   // batch outgrows the broadcast
                                   // bound (size pre-flight,
                                   // SimilaritySpec asserts the
                                   // routed plan has no nested loop)
    "search_bm25", // crossJoin(broadcast(1-row corpus stats))
    "mix_sqrt",    // crossJoin(broadcast(1-row min-stratum count))
    "skew_keys",   // crossJoin(broadcast(1-row total count))
    "skew_keys_approx", // crossJoin(broadcast(1-row CMS sketch))
    "lm_perplexity", // crossJoin(broadcast(1-row vocab size V))
    "pipeline_docs_v4", // inherits lm_perplexity's 1-row V broadcast
    "search_hybrid", // inherits bm25's 1-row stats crossJoin + the
                     // sim_topk-style broadcast(1-query) exact side
    "snapshot_agg",  // crossJoin of 1-row manifest-partial frames
    "snapshot_agg_mor" // same, at the dv-carrying tip
  )
  private val globalWindowAllowed = Set(
    "search_bm25",   // rank over topK rows after limit
    "shuffle_order", "sample_exact_n", // 256-row bucket-offset frame
    "pipeline_docs_v3" // inherits the order stage's offset window
  )

  test("no catalog query plans a cartesian product or an unpartitioned window") {
    val dir = sf()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val exec = fn(spark, dir).queryExecution.executedPlan
        val planStr = exec.toString
        val cross = (planStr.contains("CartesianProduct") ||
          planStr.contains("BroadcastNestedLoopJoin")) && !crossJoinAllowed(name)
        val unpartitionedWindow = !globalWindowAllowed(name) &&
          hasUnpartitionedWindow(exec)
        (if (cross) Seq(s"$name: cartesian/nested-loop join") else Nil) ++
          (if (unpartitionedWindow) Seq(s"$name: unpartitioned window") else Nil)
      } catch {
        case e: Throwable => Seq(s"$name: plan construction failed: ${e.getMessage}")
      } finally {
        graft.operators.OpCache.releaseAll()
        spark.catalog.clearCache()
      }
    }
    assert(failures.isEmpty, s"plan guard violations:\n${failures.mkString("\n")}")
  }

  private def hasUnpartitionedWindow(
      plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.window.WindowExec
    var found = false
    plan.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty => found = true
      case _ => ()
    }
    found
  }
}
