package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Scale levers that are policy, not physics: utilities a 100 TB
 * deployment reaches for when the default shuffle plan isn't enough.
 *
 * - AQE (`spark.sql.adaptive.*`) already handles moderate skew and
 *   post-shuffle coalescing; [[saltedEquiJoin]] is for the pathological
 *   case — a handful of keys holding a double-digit percentage of the
 *   fact table, where even a split skew-join leaves one straggler.
 * - [[writeBucketed]]/bucketed reads remove the shuffle from repeated
 *   large-large joins entirely: both sides pre-hashed into the same
 *   bucket layout join with zero Exchange (verified in ScaleSpec by
 *   asserting the physical plan has no shuffle).
 */
object Scale {

  val SaltCol = "__graft_salt"

  /**
   * Guard against under-partitioned inputs: a few small parquet files
   * arrive as 1-2 partitions, which serializes every downstream
   * map-side operator (explode fan-outs, signature kernels, cross
   * joins) onto one core. Repartitions ONLY when the scan has fewer
   * partitions than the session's default parallelism — on a real
   * multi-TB input this is a no-op, so no gratuitous full shuffle of
   * big data.
   */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /**
   * Skew-safe equi-join: the fact side gets a deterministic salt in
   * [0, salts) (hash of the whole row — reproducible, no RNG state),
   * the dim side is replicated once per salt, and the join key becomes
   * (key, salt) — a hot key's rows now spread over `salts` reducers.
   * Output equals the plain inner equi-join on `key`, in exchange for
   * `salts`× replication of the (small but not broadcastable) side.
   */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int): DataFrame = {
    require(salts >= 1)
    val saltedFact = fact.withColumn(SaltCol,
      pmod(hash(struct(fact.columns.map(col): _*)), lit(salts)))
    val saltedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, SaltCol)).drop(SaltCol)
  }

  /**
   * Write a bucketed + sorted parquet table: `numBuckets` by `keys`,
   * registered in the session catalog. Two tables bucketed the same
   * way join with NO exchange and NO sort — the co-located join
   * pattern for fact-fact joins that repeat every pipeline run.
   */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
