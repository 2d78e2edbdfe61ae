package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for every left row, attach the most
 * recent right row with `rightTs <= leftTs` for the same key — the
 * canonical time-series enrichment operator (trades←quotes,
 * events←latest order, features←latest snapshot). Spark has no
 * built-in; the naive `JOIN ... ON ts >= rts` + window formulation
 * explodes to O(pairs) before pruning.
 *
 * Implementation is the scalable union trick: tag both sides, union
 * into one frame, ONE shuffle on the key, sort by (ts, tag) inside
 * each partition, and carry the latest right payload forward with
 * `last(_, ignoreNulls)` over a running window. Cost is a single
 * sort-shuffle of left+right — the same shape as a SortMergeJoin,
 * with no pairwise blowup and no skew beyond the key's own.
 *
 * Right rows that share (key, ts) are ambiguous; callers should
 * pre-deduplicate (e.g. keep max secondary id) — ties otherwise
 * resolve to an arbitrary survivor, matching DuckDB ASOF JOIN's
 * unspecified tie behavior.
 */
object AsOf {

  /**
   * Left as-of join. Output: all left columns, then the requested
   * right columns (null when no right row precedes the left row).
   *
   * @param rightCols right columns to carry (default: all non-key,
   *                  non-ts columns of `right`)
   */
  def join(left: DataFrame, right: DataFrame,
           leftTs: String, rightTs: String,
           leftKeys: Seq[String], rightKeys: Seq[String],
           rightCols: Seq[String] = Nil): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.diff(rightKeys :+ rightTs)

    val k = leftKeys.indices.map(i => s"__k$i")
    val lSide = left.select(
      leftKeys.zip(k).map { case (c, a) => col(c).as(a) } ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__tag"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(structType(right, carry)).as("__r")): _*)
    val rSide = right.select(
        rightKeys.zip(k).map { case (c, a) => col(c).as(a) } ++ Seq(
          col(rightTs).cast("timestamp").as("__ts"),
          lit(0).as("__tag"),
          lit(null).cast(structType(left, left.columns.toSeq)).as("__l"),
          struct(carry.map(col): _*).as("__r")): _*)
      // a right row with a null (or unparseable) timestamp can never
      // satisfy rightTs <= leftTs, but nulls sort FIRST under asc —
      // kept, it would be carried into every left row before the
      // first real right row
      .filter(col("__ts").isNotNull)

    // right rows (tag 0) sort before left rows (tag 1) at equal ts →
    // the match is inclusive (rightTs == leftTs counts)
    val w = Window.partitionBy(k.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) ++
        carry.map(c => col(s"__carried.`$c`").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
