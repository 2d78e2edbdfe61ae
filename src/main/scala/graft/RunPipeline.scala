package graft

import graft.meta.MetaLoader
import org.apache.spark.sql.SparkSession

/**
 * CLI pipeline runner — graft's equivalent of the reference's
 * `main.py` entry point (reference: main.py:81-177 `run_pipeline`):
 * load a metadata JSON, pick a dataflow (by name, or the first),
 * optionally override the first source's path, run it, print a
 * validation summary.
 *
 * Usage:
 *   runMain graft.RunPipeline <metadata.json> [dataflowName] [inputPathOverride]
 *
 * Unlike the reference — which caches + counts OK/KO eagerly before
 * writing (two extra jobs) — graft computes the validation summary
 * from the single-pass [[operators.StatsOp.validationStatsFromSplit]]
 * plan and lets the sinks drive execution.
 */
object RunPipeline {

  /** Resolve + run one dataflow; returns its named frames. */
  def run(spark: SparkSession, metadataPath: String,
          dataflowName: Option[String] = None,
          inputOverride: Option[String] = None): Map[String, org.apache.spark.sql.DataFrame] = {
    val pipeline = MetaLoader.loadFile(metadataPath)
    require(pipeline.dataflows.nonEmpty, "No dataflows defined in metadata.")
    val flow0 = dataflowName.map(pipeline.dataflow)
      .getOrElse(pipeline.dataflows.head)
    val flow = inputOverride match {
      case Some(p) if flow0.sources.nonEmpty =>
        flow0.copy(sources =
          flow0.sources.head.copy(path = p) +: flow0.sources.tail)
      case _ => flow0
    }
    val frames = Dataflow.run(spark, flow)
    for {
      ok <- frames.get("validation_ok")
      ko <- frames.get("validation_ko")
    } {
      val s = operators.StatsOp.validationStatsFromSplit(ok, ko).collect().head
      println(s"Validation results: ${s.getAs[Long]("valid_records")} valid, " +
        s"${s.getAs[Long]("rejected_records")} rejected " +
        f"(${s.getAs[Double]("validation_pass_rate")}%.2f%% pass rate)")
    }
    println(s"Pipeline '${flow.name}' completed successfully")
    frames
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RunPipeline <metadata.json> [dataflowName] [inputPathOverride]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0), args.lift(1), args.lift(2))
    finally spark.stop()
  }
}
