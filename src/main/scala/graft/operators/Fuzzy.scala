package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked FUZZY (edit-distance) join — the entity-resolution
 * primitive of every dirty-data pipeline (the reference's domain,
 * motor-insurance records, is exactly where near-identical names,
 * plates and addresses need reconciling). All-pairs Levenshtein is
 * O(n²·L²) and unshuffleable at scale; the standard fix is BLOCKING:
 * candidates must share a cheap deterministic block key (a prefix, a
 * phonetic code, a length bucket — caller-supplied Column), so the
 * join is a plain hash shuffle on the block key and the quadratic
 * cost is confined to each block. Recall is bounded by the blocking
 * function (pairs differing inside the block key are unseen) — the
 * classic, documented trade; pick the key to put the "stable" part
 * of the entity in it.
 *
 * `levenshtein` is Spark's codegen'd native expression; the DuckDB
 * oracle uses its identical classic-DP `levenshtein`, so distances
 * (integers) are cross-engine exact.
 */
object Fuzzy {

  /**
   * Pairs (id_a, id_b, key_a, key_b, dist) with dist ≤ maxDist,
   * id_a < id_b, candidates blocked on `block(key)`. Self-join form:
   * pass the same frame/columns for both sides.
   */
  def selfFuzzyPairs(df: DataFrame, id: Column, key: Column,
                     block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val side = Scale.ensureParallelism(df)
      .select(id.as("id"), key.as("key"), block(key).as("blk"))
    val a = side.as("a")
    val b = side.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"),
        levenshtein(col("a.key"), col("b.key")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /**
   * Cross-frame blocked fuzzy join (left records matched to right
   * candidates): (id_l, id_r, key_l, key_r, dist), dist ≤ maxDist.
   * The master-data reconciliation shape — `right` is typically the
   * reference register.
   */
  def fuzzyJoin(left: DataFrame, leftId: Column, leftKey: Column,
                right: DataFrame, rightId: Column, rightKey: Column,
                block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val l = Scale.ensureParallelism(left)
      .select(leftId.as("id_l"), leftKey.as("key_l"), block(leftKey).as("blk"))
    val r = right
      .select(rightId.as("id_r"), rightKey.as("key_r"), block(rightKey).as("blk"))
    l.join(r, Seq("blk"))
      .select(col("id_l"), col("id_r"), col("key_l"), col("key_r"),
        levenshtein(col("key_l"), col("key_r")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
