package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge DataFrames — the Pregel-shaped
 * workload family (the connected-components member already lives in
 * [[Dedup.duplicateClusters]]' size-switched union-find; this adds
 * the canonical importance-propagation member).
 *
 * Scale shape: each iteration is one equi-join of the edge frame with
 * the current rank frame plus one map-side-combined groupBy — shuffle
 * volume ∝ |edges| per iteration, no per-vertex driver state, no
 * collect. Edge + degree frames are computed once and cached; the
 * iteration count is fixed (power iteration converges geometrically;
 * ranking stabilizes long before values do).
 *
 * Exactness discipline (the operator is oracle-gated cross-engine):
 * ranks are FIXED-POINT integers (`scale` = 1e6), every step uses
 * integer `div` (floor on non-negatives — identical in any engine)
 * and long sums (associative, partitioning-invariant), so after K
 * iterations the rank vector is bit-identical to DuckDB's unrolled
 * replay — no float accumulation anywhere.
 */
object Graph {

  /**
   * PageRank with damping 0.85 over a directed edge list `(src, dst)`
   * (duplicate edges collapse; make the graph undirected upstream by
   * unioning reversed edges — that also removes dangling nodes).
   * Returns `(node, rank)` for every node, rank an unnormalized
   * fixed-point long (init `scale` per node; ranking — not the
   * absolute value — is the deliverable).
   */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               scale: Long = 1000000L, convergeL1: Long = -1L): DataFrame =
    pageRankConverged(edges, iterations, scale, convergeL1)._1

  /**
   * [[pageRank]] with the iteration count actually run. `convergeL1`
   * adds an early exit: after each iteration one node-keyed join +
   * scalar agg measures Σ|rankᵢ − rankᵢ₋₁|; at or below the threshold
   * the loop stops (converged graphs skip the remaining iterations —
   * the power iteration is geometric, so rankings stabilize long
   * before the cap). `convergeL1 = 0` is the ORACLE-SAFE mode: it
   * stops only at the exact integer fixed point, where every further
   * iteration is a proven no-op, so the result stays bit-identical
   * to the fully unrolled K-iteration replay. Negative disables the
   * check entirely (no per-iteration action — the streaming-friendly
   * fixed-cost shape).
   */
  def pageRankConverged(edges: DataFrame, iterations: Int = 5,
                        scale: Long = 1000000L,
                        convergeL1: Long = -1L): (DataFrame, Int) = {
    require(iterations >= 1 && iterations <= 50,
      s"pageRank: iterations out of range ($iterations)")
    // EAGER checkpoints, not lazy caches: the loop references these
    // frames from several stages at once, and a lazy cache races its
    // own materialization (concurrent stages each recompute the
    // subtree before any one finishes populating it — measured as a
    // multi-x input-bytes amplification in the plan audit). The
    // checkpoint also truncates lineage, the standard iterative-
    // algorithm hygiene.
    val e = OpCache.checkpoint(edges.select(col("src"), col("dst")).distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) joined ONCE: each iteration then costs one hash
    // join with the rank frame + one map-side-combined groupBy
    val ed = OpCache.checkpoint(e.join(deg, Seq("src")))
    val nodes = OpCache.checkpoint(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    // nodes with no in-edge keep the bare teleport rank every
    // iteration — computed ONCE so the loop needs no per-iteration
    // nodes join (on an undirected graph this frame is empty)
    val noIn = OpCache.checkpoint(
      nodes.join(e.select(col("dst").as("node")).distinct(),
        Seq("node"), "left_anti"))
    val teleport = (15L * scale) / 100L
    var r = nodes.withColumn("rank", lit(scale))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val t = ed
        .join(r.select(col("node").as("src"), col("rank")), Seq("src"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("t"))
      val step = t.select(col("node"),
          (lit(teleport) + expr("(85 * t) div 100")).as("rank"))
        .unionByName(noIn.withColumn("rank", lit(teleport)))
      if (convergeL1 >= 0) {
        // checkpoint so the delta action doesn't recompute the whole
        // chain per round (and the next round starts from materialized
        // state — O(K), not O(K²))
        val next = OpCache.checkpoint(step)
        val d = next.select(col("node"), col("rank").as("rn"))
          .join(r.select(col("node"), col("rank").as("rp")), Seq("node"))
          .agg(coalesce(sum(abs(col("rn") - col("rp"))), lit(0L)).as("d"))
          .collect()(0).getLong(0)
        if (d <= convergeL1) converged = true
        r = next
      } else r = step
      it += 1
    }
    (r, it)
  }
}
