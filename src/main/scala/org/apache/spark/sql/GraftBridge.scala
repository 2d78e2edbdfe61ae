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

/**
 * Analysis-time input-type enforcement for graft expressions.
 * `ExpectsInputTypes.inputTypes` returns `Seq[AbstractDataType]`, and
 * both `AbstractDataType` and `TypeCollection` are `private[sql]` — so
 * this trait lives in the sql package and re-exposes the contract in
 * terms of public `DataType`s: each argument declares its acceptable
 * alternatives, a singleton meaning "exactly this type".
 */
trait GraftInputTypes extends catalyst.expressions.ExpectsInputTypes {
  /** Per-argument acceptable types; an inner Seq of size > 1 becomes a
    * TypeCollection (any of). */
  def graftInputTypes: Seq[Seq[types.DataType]]
  override def inputTypes: Seq[types.AbstractDataType] =
    graftInputTypes.map { alts =>
      if (alts.size == 1) alts.head else types.TypeCollection(alts: _*)
    }
}
