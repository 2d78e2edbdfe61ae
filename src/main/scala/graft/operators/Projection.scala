package graft.operators

import graft.meta.AddedField
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column projection + metadata fields
 * (reference: src/transformations.py:216-285 `drop_columns`,
 * `select_columns`, `add_fields`).
 *
 * Both select and drop are plain Catalyst projections, so column
 * pruning reaches the parquet scan — selecting 2 of 40 columns reads
 * 2 column chunks at 100 TB, not 40.
 */
object Projection {

  /** Keep only listed columns that exist; no-op when none exist. */
  def selectColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    if (columns.isEmpty) return df
    val existing = df.columns.toSet
    val keep = columns.filter(existing.contains)
    if (keep.isEmpty) df else df.select(keep.map(col): _*)
  }

  /** Drop listed columns that exist. */
  def dropColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    if (columns.isEmpty) return df
    val existing = df.columns.toSet
    val toDrop = columns.filter(existing.contains)
    if (toDrop.isEmpty) df else df.drop(toDrop: _*)
  }

  /**
   * Add/override metadata fields. `current_timestamp` matches the
   * reference's ingestion stamp (reference: src/transformations.py:
   * 265-285); `literal` supports deterministic pipeline tags
   * (run ids, source labels) that stay hash-comparable in tests.
   */
  def addFields(df: DataFrame, fields: Seq[AddedField]): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      (f.function, f.literal) match {
        case (Some("current_timestamp"), _) => acc.withColumn(f.name, current_timestamp())
        case (Some("current_date"), _)      => acc.withColumn(f.name, current_date())
        case (None, Some(v))                => acc.withColumn(f.name, lit(v))
        case (other, _) =>
          throw new IllegalArgumentException(
            s"Unsupported add_fields function: $other for field '${f.name}'")
      }
    }
}
