package graft

import graft.meta.{MetaLoader, Schedule}
import org.apache.spark.sql.SparkSession

import java.nio.file.Paths
import java.time.Instant

/**
 * Scheduled-pipeline driver — the reference's Airflow DAG without the
 * orchestrator (reference: dags/motor_pipeline_dag.py:1-60). Reads the
 * pipeline spec's `schedule` block, computes every due logical run
 * from the last-completed state ([[meta.Schedule.dueRuns]] — catchup
 * included), binds each run's `${run_date}`-style templates into the
 * flow's source/sink paths, executes runs oldest-first, and records
 * each completion before starting the next, so a crash resumes
 * exactly where it stopped.
 *
 * Usage (from cron, CI, or a shell loop — any trigger works because
 * the catchup math, not the trigger cadence, decides what runs):
 *
 *   runMain graft.ScheduleRunner <metadata.json> <state-file> \
 *       [dataflowName] [--now=ISO_INSTANT] [--dry-run]
 *
 * `--now` pins the wall clock (tests/backfill rehearsal); `--dry-run`
 * prints the bound runs without executing. See
 * examples/scheduled_delta.json for the canonical daily-delta flow.
 */
object ScheduleRunner {

  /** Compute + execute due runs; returns the logical times executed. */
  def runDue(spark: SparkSession, metadataPath: String, statePath: String,
             dataflowName: Option[String], now: Instant,
             dryRun: Boolean = false): Seq[Instant] = {
    val pipeline = MetaLoader.loadFile(metadataPath)
    val sched = pipeline.schedule.getOrElse(throw new IllegalArgumentException(
      s"$metadataPath has no 'schedule' block"))
    val flow0 = dataflowName.map(pipeline.dataflow)
      .getOrElse(pipeline.dataflows.head)
    val state = Paths.get(statePath)
    val due = Schedule.dueRuns(sched, Schedule.readState(state), now)
    due.foreach { t =>
      val bound = Schedule.bind(flow0, t, sched.interval)
      println(s"[schedule] run logical=$t flow='${bound.name}'" +
        (if (dryRun) " (dry-run)" else ""))
      if (!dryRun) {
        Dataflow.run(spark, bound)
        Schedule.writeState(state, t)
      }
    }
    if (due.isEmpty) println("[schedule] nothing due")
    due
  }

  def main(argsIn: Array[String]): Unit = {
    val now = argsIn.collectFirst { case a if a.startsWith("--now=") =>
      Instant.parse(a.stripPrefix("--now=")) }.getOrElse(Instant.now())
    val dryRun = argsIn.contains("--dry-run")
    val args = argsIn.filterNot(_.startsWith("--"))
    require(args.length >= 2,
      "usage: ScheduleRunner <metadata.json> <state-file> [dataflowName] [--now=ISO] [--dry-run]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-schedule")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runDue(spark, args(0), args(1), args.lift(2), now, dryRun)
    finally spark.stop()
  }
}
