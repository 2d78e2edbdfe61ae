package graft

import graft.meta.{Schedule, ScheduleSpec => SchedSpec}

import java.time.Instant
import scala.jdk.CollectionConverters._

class ScheduleSpec extends SparkSpecBase {
  import spark.implicits._

  private val daily = SchedSpec("daily", "2026-08-01T00:00:00Z")

  test("dueRuns: full catchup from anchor when no state") {
    // now = Aug 4 06:00 -> intervals [1,2) [2,3) [3,4) have closed
    val due = Schedule.dueRuns(daily, None, Instant.parse("2026-08-04T06:00:00Z"))
    assert(due === Seq("2026-08-01T00:00:00Z", "2026-08-02T00:00:00Z",
      "2026-08-03T00:00:00Z").map(Instant.parse))
  }

  test("dueRuns: resumes strictly after last completed, no duplicates") {
    val due = Schedule.dueRuns(daily,
      Some(Instant.parse("2026-08-02T00:00:00Z")),
      Instant.parse("2026-08-04T06:00:00Z"))
    assert(due === Seq(Instant.parse("2026-08-03T00:00:00Z")))
  }

  test("dueRuns: nothing due before the first interval closes") {
    assert(Schedule.dueRuns(daily, None,
      Instant.parse("2026-08-01T23:59:59Z")).isEmpty)
    // last=Aug 3, now=Aug 4 23:00 -> Aug 4's interval [4,5) is still
    // open, so nothing is due yet
    assert(Schedule.dueRuns(daily,
      Some(Instant.parse("2026-08-03T00:00:00Z")),
      Instant.parse("2026-08-04T23:00:00Z")).isEmpty)
    // ...and becomes due the moment it closes
    assert(Schedule.dueRuns(daily,
      Some(Instant.parse("2026-08-04T00:00:00Z")),
      Instant.parse("2026-08-06T00:00:00Z")) ===
      Seq(Instant.parse("2026-08-05T00:00:00Z")))
  }

  test("dueRuns: state before the anchor does not skip the anchor run") {
    val due = Schedule.dueRuns(daily,
      Some(Instant.parse("2026-07-15T00:00:00Z")),  // predates the anchor
      Instant.parse("2026-08-03T06:00:00Z"))
    assert(due.head === Instant.parse("2026-08-01T00:00:00Z"))
    assert(due.size === 2)
  }

  test("dueRuns: catchup=false keeps only the most recent due run") {
    val noCatchup = daily.copy(catchup = false)
    val due = Schedule.dueRuns(noCatchup, None,
      Instant.parse("2026-08-10T12:00:00Z"))
    assert(due === Seq(Instant.parse("2026-08-09T00:00:00Z")))
  }

  test("substitute binds run_date / prev_run_date / run_hour / run_ts") {
    val t = Instant.parse("2026-08-03T00:00:00Z")
    assert(Schedule.substitute(
      "/d/s=${run_date}/p=${prev_run_date}/h=${run_hour}/t=${run_ts}",
      t, "daily") ===
      s"/d/s=2026-08-03/p=2026-08-02/h=00/t=${t.getEpochSecond}")
  }

  test("ScheduleRunner: daily delta backfill end-to-end with crash-safe state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched").toString
    // three daily snapshots: day2 updates doc 2 and adds doc 4;
    // day3 removes doc 1
    def write(date: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/corpus/snapshot_date=$date")
    write("2026-08-01", Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    write("2026-08-02", Seq(1L -> "a", 2L -> "B!", 3L -> "c", 4L -> "d"))
    write("2026-08-03", Seq(2L -> "B!", 3L -> "c", 4L -> "d"))
    val metaJson =
      s"""{"schedule":{"interval":"daily","anchor":"2026-08-01T00:00:00Z"},
         |"dataflows":[{"name":"delta",
         |"sources":[
         | {"name":"prev","path":"$dir/corpus/snapshot_date=$${prev_run_date}","format":"parquet"},
         | {"name":"cur","path":"$dir/corpus/snapshot_date=$${run_date}","format":"parquet"}],
         |"transformations":[
         | {"name":"d","type":"version_delta","params":{"input":"prev","new_input":"cur",
         |   "output":"delta","id":"doc_id","content":"text"}},
         | {"name":"ch","type":"sql","params":{"input":"delta","output":"changed",
         |   "query":"SELECT doc_id, status FROM delta WHERE status <> 'unchanged'"}}],
         |"sinks":[{"input":"changed","name":"out",
         | "paths":["$dir/delta/run_date=$${run_date}"],"format":"parquet","saveMode":"overwrite"}]
         |}]}""".stripMargin
    val metaPath = s"$dir/pipeline.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath), metaJson)
    val statePath = s"$dir/state"

    // logical runs 08-02 and 08-03 are due at now=08-04 (run t compares
    // ${prev_run_date}=t-1d to ${run_date}=t; the 08-01 anchor run has
    // no 07-31 snapshot, so the anchor is set to the first COMPARABLE
    // run minus nothing — state pre-seeded to 08-01 models "initial
    // snapshot loaded, deltas from then on")
    Schedule.writeState(java.nio.file.Paths.get(statePath),
      Instant.parse("2026-08-01T00:00:00Z"))
    val ran = ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-04T06:00:00Z"))
    assert(ran === Seq("2026-08-02T00:00:00Z", "2026-08-03T00:00:00Z").map(Instant.parse))

    val d2 = spark.read.parquet(s"$dir/delta/run_date=2026-08-02")
      .as[(Long, String)].collect().toSet
    assert(d2 === Set(2L -> "updated", 4L -> "added"))
    val d3 = spark.read.parquet(s"$dir/delta/run_date=2026-08-03")
      .as[(Long, String)].collect().toSet
    assert(d3 === Set(1L -> "removed"))

    // state advanced to the last completed run; nothing further due
    assert(Schedule.readState(java.nio.file.Paths.get(statePath)) ===
      Some(Instant.parse("2026-08-03T00:00:00Z")))
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-04T06:00:00Z")).isEmpty)
  }

  test("ScheduleRunner: retries + retry_delay, crash-safe attempt state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched_retry").toString
    def write(date: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/corpus/snapshot_date=$date")
    write("2026-08-02", Seq(1L -> "a", 2L -> "b"))
    // the 08-03 snapshot has NOT landed yet — the flaky fixture: the
    // run fails on read until late upstream data arrives
    val metaJson =
      s"""{"schedule":{"interval":"daily","anchor":"2026-08-01T00:00:00Z",
         |  "retries":1,"retry_delay_minutes":5},
         |"dataflows":[{"name":"delta",
         |"sources":[
         | {"name":"prev","path":"$dir/corpus/snapshot_date=$${prev_run_date}","format":"parquet"},
         | {"name":"cur","path":"$dir/corpus/snapshot_date=$${run_date}","format":"parquet"}],
         |"transformations":[
         | {"name":"d","type":"version_delta","params":{"input":"prev","new_input":"cur",
         |   "output":"delta","id":"doc_id","content":"text"}}],
         |"sinks":[{"input":"delta","name":"out",
         | "paths":["$dir/delta/run_date=$${run_date}"],"format":"parquet","saveMode":"overwrite"}]
         |}]}""".stripMargin
    val metaPath = s"$dir/pipeline.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath), metaJson)
    val statePath = s"$dir/state"
    val stateP = java.nio.file.Paths.get(statePath)
    Schedule.writeState(stateP, Instant.parse("2026-08-02T00:00:00Z"))

    // attempt 1 fails (cur snapshot missing), is swallowed (retries
    // remain), and the failure is recorded next to the completion
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-04T00:10:00Z")).isEmpty)
    val st1 = Schedule.readFullState(stateP)
    assert(st1.lastCompleted === Some(Instant.parse("2026-08-02T00:00:00Z")))
    assert(st1.failure.map(f => (f.logical, f.attempts)) ===
      Some((Instant.parse("2026-08-03T00:00:00Z"), 1)))

    // a trigger INSIDE the retry_delay window does nothing
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-04T00:12:00Z")).isEmpty)
    assert(Schedule.readFullState(stateP) === st1,
      "a too-early trigger must not consume an attempt")

    // upstream lands late; the next trigger past the delay retries and
    // succeeds, clearing the failure and advancing the completion
    write("2026-08-03", Seq(1L -> "a", 2L -> "B!"))
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-04T00:16:00Z")) ===
      Seq(Instant.parse("2026-08-03T00:00:00Z")))
    val st2 = Schedule.readFullState(stateP)
    assert(st2 === Schedule.SchedState(
      Some(Instant.parse("2026-08-03T00:00:00Z")), None))

    // exhaustion: the 08-04 run fails twice (snapshot never lands) —
    // second failure exceeds retries=1 and rethrows terminally
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-05T00:10:00Z")).isEmpty)
    val ex = intercept[RuntimeException] {
      ScheduleRunner.runDue(spark, metaPath, statePath, None,
        Instant.parse("2026-08-05T00:20:00Z"))
    }
    assert(ex.getMessage.contains("retries=1 exhausted"))
    assert(Schedule.readFullState(stateP).failure.map(_.attempts) === Some(2))

    // exhaustion is TERMINAL: a later trigger rethrows without
    // executing or consuming attempts — clearing the state line is
    // the only way back (Airflow's manual task clear)
    val ex2 = intercept[RuntimeException] {
      ScheduleRunner.runDue(spark, metaPath, statePath, None,
        Instant.parse("2026-08-05T02:00:00Z"))
    }
    assert(ex2.getMessage.contains("already failed 2 times"))
    assert(Schedule.readFullState(stateP).failure.map(_.attempts) === Some(2))
  }

  /** A minimal daily append-sink pipeline for the lock tests: a
    * double-execution of the same logical run doubles the sink rows,
    * so row counts detect it. Returns (metaPath, statePath, sinkDir). */
  private def lockFixture(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched_lock").toString
    Seq(1L -> "a", 2L -> "b").toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    val metaJson =
      s"""{"schedule":{"interval":"daily","anchor":"2026-08-01T00:00:00Z"},
         |"dataflows":[{"name":"copy",
         |"sources":[{"name":"in","path":"$dir/in","format":"parquet"}],
         |"transformations":[],
         |"sinks":[{"input":"in","name":"out",
         | "paths":["$dir/out"],"format":"parquet","saveMode":"append"}]
         |}]}""".stripMargin
    val metaPath = s"$dir/pipeline.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath), metaJson)
    Schedule.writeState(java.nio.file.Paths.get(s"$dir/state"),
      Instant.parse("2026-08-01T00:00:00Z"))
    (metaPath, s"$dir/state", s"$dir/out")
  }

  test("scheduled incremental refresh: delta -> merge sink rewrites only " +
    "changed-key partitions of the serving table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sched_merge").toString
    def write(date: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "lang").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/corpus/snapshot_date=$date")
    // day1: en={1,2}, de={3}, fr={4,6}; day2 updates doc2, adds doc5
    // (en), removes doc4 (fr). de is untouched by the refresh.
    val day1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"),
      (4L, "d", "fr"), (6L, "f", "fr"))
    val day2 = Seq((1L, "a", "en"), (2L, "B!", "en"), (3L, "c", "de"),
      (5L, "e", "en"), (6L, "f", "fr"))
    write("2026-08-01", day1)
    write("2026-08-02", day2)
    val serving = s"$dir/serving"
    day1.toDF("doc_id", "text", "lang")
      .write.partitionBy("lang").parquet(serving)
    val fileStateDe = {
      val root = java.nio.file.Paths.get(serving, "lang=de")
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => f.toString ->
          java.nio.file.Files.getLastModifiedTime(f).toMillis).toMap
      finally walk.close()
    }

    val metaJson =
      s"""{"schedule":{"interval":"daily","anchor":"2026-08-01T00:00:00Z"},
         |"dataflows":[{"name":"refresh",
         |"sources":[
         | {"name":"prev","path":"$dir/corpus/snapshot_date=$${prev_run_date}","format":"parquet"},
         | {"name":"cur","path":"$dir/corpus/snapshot_date=$${run_date}","format":"parquet"}],
         |"transformations":[
         | {"name":"d","type":"version_delta","params":{"input":"prev","new_input":"cur",
         |   "output":"delta","id":"doc_id","content":"text"}},
         | {"name":"chg","type":"sql","params":{"input":"delta","output":"changes",
         |   "query":"SELECT c.doc_id, c.text, c.lang, false AS __deleted FROM delta d JOIN cur c ON d.doc_id = c.doc_id WHERE d.status IN ('added','updated') UNION ALL SELECT d.doc_id, CAST(NULL AS STRING), CAST(NULL AS STRING), true FROM delta d WHERE d.status = 'removed'"}}],
         |"sinks":[{"input":"changes","name":"serve","paths":["$serving"],
         | "format":"parquet","saveMode":"merge","mergeKey":"doc_id",
         | "partitionBy":["lang"]}]
         |}]}""".stripMargin
    val metaPath = s"$dir/pipeline.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath), metaJson)
    val statePath = s"$dir/state"
    Schedule.writeState(java.nio.file.Paths.get(statePath),
      Instant.parse("2026-08-01T00:00:00Z"))

    val ran = ScheduleRunner.runDue(spark, metaPath, statePath, None,
      Instant.parse("2026-08-03T06:00:00Z"))
    assert(ran === Seq(Instant.parse("2026-08-02T00:00:00Z")))

    // serving table now equals the day-2 snapshot
    assert(spark.read.parquet(serving).select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet === day2.toSet)
    // the unchanged partition's files were not rewritten
    val afterDe = {
      val root = java.nio.file.Paths.get(serving, "lang=de")
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => f.toString ->
          java.nio.file.Files.getLastModifiedTime(f).toMillis).toMap
      finally walk.close()
    }
    assert(afterDe === fileStateDe,
      "lang=de saw no change — the scheduled merge must not rewrite it")
  }

  test("concurrency guard: a held lock makes a trigger no-op; stale locks are stolen") {
    val (metaPath, statePath, out) = lockFixture()
    val lock = java.nio.file.Paths.get(statePath + ".lock")
    val now = Instant.parse("2026-08-03T06:00:00Z")

    // fresh lock held by "another trigger": this one must no-op
    java.nio.file.Files.createFile(lock)
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None, now).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)),
      "a skipped trigger must not have executed anything")
    // ...but dry-run still lists (rehearsals never block)
    assert(ScheduleRunner.runDue(spark, metaPath, statePath, None, now,
      dryRun = true).nonEmpty)

    // age the lock past the staleness bound: the next trigger steals
    // it, runs, and releases
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.from(
        Instant.now().minusSeconds((ScheduleRunner.StaleLockMinutes + 1) * 60)))
    val ran = ScheduleRunner.runDue(spark, metaPath, statePath, None, now)
    assert(ran === Seq(Instant.parse("2026-08-02T00:00:00Z")))
    assert(!java.nio.file.Files.exists(lock), "the winner must release the lock")
    assert(spark.read.parquet(out).count() === 2)
  }

  test("concurrency guard: two racing triggers — one runs, one no-ops, no double sink write") {
    val (metaPath, statePath, out) = lockFixture()
    val now = Instant.parse("2026-08-03T06:00:00Z")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    def trigger(): Future[Seq[Instant]] = Future {
      barrier.await()
      ScheduleRunner.runDue(spark, metaPath, statePath, None, now)
    }
    val (a, b) = (trigger(), trigger())
    val results = Seq(a, b).map(Await.result(_, scala.concurrent.duration.Duration("120s")))
    // exactly one trigger executed the due run (the loser either hit
    // the lock or, if fully serialized, found nothing left due)
    assert(results.flatten === Seq(Instant.parse("2026-08-02T00:00:00Z")),
      s"exactly one trigger must win, got $results")
    // and the append sink holds ONE run's rows — the double-write the
    // lock exists to prevent would show 4 here
    assert(spark.read.parquet(out).count() === 2)
  }
}
