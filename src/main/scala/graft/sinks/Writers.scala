package graft.sinks

import graft.meta.SinkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sink writers (reference: main.py:47-78). JSON/CSV/parquet with
 * saveMode; array columns are flattened to comma-joined strings for
 * CSV (CSV has no array type — reference: main.py:62-70).
 *
 * Scale notes: prefer parquet + `partitionBy` for anything large —
 * partition columns become directory pruning for downstream readers.
 * A validated stream is best written ONCE, partitioned by validity
 * (see Validate.tagged), instead of two filtered passes.
 */
object Writers {

  def write(df: DataFrame, spec: SinkSpec): Unit = {
    val prepared = if (spec.format == "csv") flattenArraysForCsv(df) else df
    spec.paths.foreach { path =>
      val w = prepared.write.mode(spec.saveMode).format(spec.format)
      val p = if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w
      p.save(path)
    }
  }

  /** CSV cannot carry arrays; join them with commas like the reference. */
  def flattenArraysForCsv(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType.typeName == "array") acc.withColumn(f.name, concat_ws(",", col(f.name)))
      else acc
    }
}
