package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/**
 * The one `private[sql]` doorway this library uses: executing an
 * already-analyzed [[LogicalPlan]] as a DataFrame
 * (`classic.Dataset.ofRows`). Needed by the SQL MERGE command
 * ([[graft.sources.GraftMergeCommand]]), whose USING source arrives
 * from the analyzer as a plan, not a DataFrame — there is no public
 * API for this, and every mainstream Spark table format ships the
 * same bridge (a class inside `org.apache.spark.sql` reaching the
 * qualified-private member). Kept to a single function in a single
 * file so the boundary is auditable.
 */
object SqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Re-tag a batch frame as STREAMING (`isStreaming = true`) — what
    * a V1 streaming `Source.getBatch` must return. The physical plan
    * is pinned here (lazily — nothing executes until the sink runs),
    * which is correct for a micro-batch: its content is an immutable
    * function of the offset range. */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: the delivered micro-batch
    * frame is still streaming-tagged, so ordinary actions on it are
    * refused — re-wrap its physical rows as a BATCH frame (exactly
    * what Spark's own foreachBatch sink does before handing the user
    * the batch). */
  def asBatchFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
