package graft.meta

import java.time.{Duration, Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/**
 * Scheduling + catchup semantics for metadata pipelines — the
 * orchestrator-free equivalent of the reference's Airflow DAG
 * (reference: dags/motor_pipeline_dag.py:1-60, `schedule_interval`
 * + `catchup`). The reference delegates "run this pipeline daily,
 * backfill what was missed" to Airflow; graft expresses the same
 * contract as a pure function over (anchor, interval, last-completed,
 * now), so any scheduler — cron, CI, a while-loop — can drive it and
 * the catchup math stays testable.
 *
 * Model (Airflow's data-interval semantics): boundaries are
 * `anchor + k·interval`; the run with logical time `t` covers the
 * data interval `[t, t + interval)` and becomes DUE once that
 * interval has closed (`now >= t + interval`). `dueRuns` enumerates
 * every closed, not-yet-completed boundary — that list IS the
 * backfill. With `catchup = false` only the most recent due run
 * fires (Airflow's `catchup=False`).
 *
 * Paths in the spec may carry `${run_date}`, `${run_hour}`,
 * `${run_ts}` and `${prev_run_date}` templates; [[bind]] resolves
 * them for one logical run, turning a static dataflow into a
 * date-partitioned incremental one (see
 * examples/scheduled_delta.json: yesterday's snapshot vs today's
 * through the corpus_delta operator).
 */
object Schedule {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
  private val hourFmt = DateTimeFormatter.ofPattern("HH").withZone(ZoneOffset.UTC)

  def intervalOf(name: String): Duration = name.toLowerCase match {
    case "hourly" => Duration.ofHours(1)
    case "daily"  => Duration.ofDays(1)
    case "weekly" => Duration.ofDays(7)
    case other => throw new IllegalArgumentException(
      s"schedule: unknown interval '$other' (hourly|daily|weekly)")
  }

  /**
   * Logical times of every run that is due: boundaries strictly after
   * `lastCompleted` (all of them, if none yet) whose data interval has
   * closed by `now`. Oldest first, so executing the list in order and
   * recording each completion is a crash-safe backfill.
   */
  def dueRuns(spec: ScheduleSpec, lastCompleted: Option[Instant],
              now: Instant): Seq[Instant] = {
    val step = intervalOf(spec.interval)
    val anchor = Instant.parse(spec.anchor)
    if (now.isBefore(anchor.plus(step))) return Nil
    // first candidate: the boundary after lastCompleted, else the
    // anchor. A state timestamp BEFORE the anchor (hand-edited /
    // anchor moved later) must not skip the anchor run — treat it as
    // no state.
    val first = lastCompleted match {
      case Some(lc) if !lc.isBefore(anchor) =>
        val k = Duration.between(anchor, lc).toMillis / step.toMillis
        anchor.plus(step.multipliedBy(k + 1))
      case _ => anchor
    }
    val due = Iterator.iterate(first)(_.plus(step))
      .takeWhile(t => !now.isBefore(t.plus(step)))
      .toSeq
    if (spec.catchup || due.isEmpty) due else Seq(due.last)
  }

  /** Resolve `${run_date}`/`${run_hour}`/`${run_ts}`/`${prev_run_date}`
    * in a path for the run with logical time `t`. */
  def substitute(path: String, t: Instant, interval: String): String = {
    val prev = t.minus(intervalOf(interval))
    path
      .replace("${run_date}", dateFmt.format(t))
      .replace("${run_hour}", hourFmt.format(t))
      .replace("${run_ts}", t.getEpochSecond.toString)
      .replace("${prev_run_date}", dateFmt.format(prev))
  }

  /** Bind one logical run: substitute date templates in every source
    * and sink path of the flow. */
  def bind(flow: DataflowSpec, t: Instant, interval: String): DataflowSpec =
    flow.copy(
      sources = flow.sources.map(s => s.copy(path = substitute(s.path, t, interval))),
      sinks = flow.sinks.map(k => k.copy(
        paths = k.paths.map(substitute(_, t, interval)),
        snapshotTag = substitute(k.snapshotTag, t, interval))))

  // -- completion state (what Airflow keeps in its metadata DB) -------

  /** One failed-and-retryable run: which logical time, how many
    * attempts so far, and when the last one failed (the retry gate is
    * `lastFail + retry_delay`). The Airflow analogue is a task
    * instance in `up_for_retry`. */
  final case class RunFailure(logical: Instant, attempts: Int, lastFail: Instant)

  /** Full schedule state: last completed boundary plus an optional
    * in-flight failure. Serialized as line 1 = completed instant (or
    * `-` before the first completion) and an optional line 2
    * `failed <logical> <attempts> <lastFail>` — the legacy
    * single-line files parse unchanged. */
  final case class SchedState(lastCompleted: Option[Instant],
                              failure: Option[RunFailure])

  /** Read the last completed logical time; None if the file does not
    * exist (first run => full backfill). */
  def readState(path: java.nio.file.Path): Option[Instant] =
    readFullState(path).lastCompleted

  def readState(path: String): Option[Instant] =
    readFullState(path).lastCompleted

  def readFullState(path: java.nio.file.Path): SchedState =
    readFullState(path.toString)

  /** State IO rides [[graft.operators.LogStore.forPath]]: a bare path
    * keeps java.nio semantics, a scheme-qualified one (`hdfs://…`)
    * goes through the Hadoop store — scheduled pipelines keep their
    * completion/retry state on the same fabric their tables live on. */
  def readFullState(path: String): SchedState = {
    val store = graft.operators.LogStore.forPath(path)
    if (!store.exists(path)) SchedState(None, None)
    else {
      val lines = new String(store.read(path),
        java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').map(_.trim).filter(_.nonEmpty)
      val lc = lines.headOption.filter(_ != "-").map(Instant.parse)
      val fail = lines.find(_.startsWith("failed ")).map { l =>
        val p = l.split("\\s+")
        RunFailure(Instant.parse(p(1)), p(2).toInt, Instant.parse(p(3)))
      }
      SchedState(lc, fail)
    }
  }

  /** Record a completed logical time (atomic replace, so a crash
    * mid-write never corrupts the state). Clears any recorded
    * failure — the run that just completed IS the one that was
    * failing, or supersedes it. */
  def writeState(path: java.nio.file.Path, t: Instant): Unit =
    writeFullState(path.toString, SchedState(Some(t), None))

  def writeState(path: String, t: Instant): Unit =
    writeFullState(path, SchedState(Some(t), None))

  def writeFullState(path: java.nio.file.Path, st: SchedState): Unit =
    writeFullState(path.toString, st)

  /** Persist the full state with atomic-replace crash safety (the
    * store's `putReplace` — staged write + atomic rename): a crash
    * between attempt and state write re-runs the attempt
    * (at-least-once, like Airflow). */
  def writeFullState(path: String, st: SchedState): Unit = {
    val body = st.lastCompleted.map(_.toString).getOrElse("-") +
      st.failure.map(f => s"\nfailed ${f.logical} ${f.attempts} ${f.lastFail}")
        .getOrElse("")
    graft.operators.LogStore.forPath(path).putReplace(path,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

/** Optional `schedule` block of a pipeline spec. `anchor` is the ISO
  * instant of the first data interval's start. `retries` /
  * `retryDelayMinutes` mirror the reference DAG's
  * `retries`/`retry_delay` default_args (reference:
  * dags/motor_pipeline_dag.py:13-14): a failed run is re-attempted up
  * to `retries` more times, each attempt gated on `retry_delay`
  * having elapsed since the last failure. */
final case class ScheduleSpec(
    interval: String,            // hourly | daily | weekly
    anchor: String,              // e.g. "2026-08-01T00:00:00Z"
    catchup: Boolean = true,
    retries: Int = 0,
    retryDelayMinutes: Long = 5)
