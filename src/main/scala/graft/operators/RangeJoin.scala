package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: left rows with a point timestamp matched to
 * right rows with an interval [start, end) for the same key.
 *
 * Spark plans `l.ts >= r.start AND l.ts < r.end` as a broadcast
 * nested-loop (or worse, a cartesian) — O(|L|·|R|) comparisons per
 * key. The scale path here buckets time: each right interval is
 * exploded to the buckets it covers, each left point has exactly ONE
 * bucket, and the join becomes a hash equi-join on (key, bucket) with
 * a residual exact filter. Bucket width trades replication (long
 * intervals cover many buckets) against candidate precision; pick it
 * near the median interval length.
 *
 * No distinct needed: a left row meets a qualifying right interval in
 * exactly one bucket — its own — so the equi-join emits each matched
 * pair once.
 */
object RangeJoin {

  /**
   * @param bucketSeconds bucket width in seconds
   * @param leftTs        point-timestamp column on `left`
   * @param rightStart    inclusive interval start on `right`
   * @param rightEnd      exclusive interval end on `right`
   */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightStart: String, rightEnd: String,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   bucketSeconds: Long): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c.cast("timestamp")) / bucketSeconds)

    val l = left.withColumn("__bucket", bucketOf(col(leftTs)))
    // end is exclusive: an interval ending exactly on a bucket
    // boundary does not cover that bucket
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rightStart)),
        bucketOf(col(rightEnd).cast("timestamp") - expr("INTERVAL 1 MICROSECOND")))))

    val keyCond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _)
    // the residual must compare under the SAME timestamp cast the
    // bucketing used — raw string columns would compare
    // lexicographically and silently drop matches
    l.join(r, keyCond && l("__bucket") === r("__bucket") &&
        l(leftTs).cast("timestamp") >= r(rightStart).cast("timestamp") &&
        l(leftTs).cast("timestamp") < r(rightEnd).cast("timestamp"))
      .drop("__bucket")
  }
}
