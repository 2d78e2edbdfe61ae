package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splitting for training pipelines.
 *
 * `randomSplit` is seed- and partitioning-dependent: re-running on a
 * repartitioned input reassigns rows. A hash split is a pure function
 * of the record id — stable under re-partitioning, re-runs, backfills
 * and engine changes (md5 is everywhere), which is what training/eval
 * hygiene actually requires: a document must never migrate from test
 * into train between pipeline versions.
 */
object Sampling {

  /** Stable bucket in [0, 100) from the id's md5. */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % 100)

  /**
   * Assign train/val/test by hash bucket: [0, trainPct) → train,
   * [trainPct, trainPct+valPct) → val, rest → test.
   */
  def hashSplit(df: DataFrame, id: Column,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(id)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
