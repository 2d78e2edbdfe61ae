package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column↔Expression converters so
 * graft's native Catalyst expressions (graft.functions.VectorExprs,
 * TextFeatures) can be used as ordinary Columns without requiring a
 * session built with SparkSessionExtensions (the driver owns the
 * session used for SparkEntry.queries, so graft cannot rely on
 * extension injection).
 */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
