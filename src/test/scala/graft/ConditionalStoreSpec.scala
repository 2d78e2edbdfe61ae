package graft

import graft.operators.{ConditionalWriteLogStore, LogStore, Snapshot}
import org.apache.spark.sql.functions._

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * The multi-writer object-store story as an EXECUTABLE CONTRACT:
 * [[ConditionalWriteLogStore]] arbitrates `putIfAbsent`/`createNew`
 * through a shared atomic map (the in-JVM stand-in for an S3
 * `If-None-Match` PUT / DynamoDB conditional put-item) and delegates
 * bytes to the Hadoop store. Registered for the `file` scheme via
 * `spark.graft.logstore.file`, the FULL optimistic-concurrency suite
 * runs through it — two racing stagers, one winner, the loser
 * rebases — which is the conformance test a real S3 binding of the
 * same template should pass.
 */
class ConditionalStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def withConditionalStore[A](body: => A): A =
    try {
      spark.conf.set("spark.graft.logstore.file",
        "graft.operators.ConditionalWriteLogStore")
      body
    } finally spark.conf.unset("spark.graft.logstore.file")

  private def seedDf =
    (0 until 30).map(i => (i.toLong, s"pay_$i", s"p${i / 10}"))
      .toDF("id", "payload", "part")

  private def rowsOf(t: String): Set[(Long, String, String)] =
    Snapshot.readLatest(spark, t).select("id", "payload", "part")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("the conditional primitives have exactly one winner under a true race") {
    withConditionalStore {
      val st = LogStore.forPath("file:///tmp/x")
      assert(st.isInstanceOf[ConditionalWriteLogStore])
      val dir = s"file://${freshDir("graft_cond_prims")}"
      st.mkdirs(dir)
      (1 to 30).foreach { round =>
        val p = s"$dir/m$round.json"
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val gate = new java.util.concurrent.CountDownLatch(1)
        val ts = (0 until 4).map { w =>
          new Thread(() => {
            gate.await()
            try { st.putIfAbsent(p, s"writer$w".getBytes); wins.incrementAndGet() }
            catch { case _: FileAlreadyExistsException => () }
          })
        }
        ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
        assert(wins.get() == 1, s"round $round: ${wins.get()} manifest winners")
        // lock primitive: same arbitration
        val l = s"$dir/l$round.lock"
        val locks = new java.util.concurrent.atomic.AtomicInteger(0)
        val gate2 = new java.util.concurrent.CountDownLatch(1)
        val ls = (0 until 4).map(_ => new Thread(() => {
          gate2.await()
          if (st.createNew(l)) locks.incrementAndGet()
        }))
        ls.foreach(_.start()); gate2.countDown(); ls.foreach(_.join())
        assert(locks.get() == 1, s"round $round: ${locks.get()} lock winners")
        // release clears the claim: the next claim succeeds
        assert(st.delete(l) && st.createNew(l))
      }
    }
  }

  test("two racing stagers through the conditional store: one wins, the loser rebases and converges") {
    withConditionalStore {
      val t = s"file://${freshDir("graft_cond_race")}/tbl"
      Snapshot.create(spark, t, seedDf, "id", "part")
      // both stage from v1, touching the SAME partition (true conflict)
      val stagedA = Snapshot.stageMerge(spark, t,
        upserts = Seq((1L, "a-wins", "p0")).toDF("id", "payload", "part"),
        deleteKeys = spark.emptyDataset[Long].toDF("id"))
      val stagedB = Snapshot.stageMerge(spark, t,
        upserts = Seq((2L, "b-tries", "p0")).toDF("id", "payload", "part"),
        deleteKeys = spark.emptyDataset[Long].toDF("id"))
      val a = Snapshot.commitStaged(spark, stagedA) // winner
      assert(a.version == 2)
      val e = intercept[Snapshot.CommitConflictException](
        Snapshot.commitStaged(spark, stagedB))
      assert(e.getMessage.contains("p0"))
      stagedB.abort()
      // the loser's retry loop recomputes against v2 and lands both
      val b = Snapshot.mergeOptimistic(spark, t,
        upserts = Seq((2L, "b-rebased", "p0")).toDF("id", "payload", "part"),
        deleteKeys = spark.emptyDataset[Long].toDF("id"))
      assert(b.version == 3)
      val rows = rowsOf(t)
      assert(rows.contains((1L, "a-wins", "p0")) &&
        rows.contains((2L, "b-rebased", "p0")) && rows.size == 30)
      // disjoint-partition stage rebases WITHOUT conflict
      val stagedC = Snapshot.stageMerge(spark, t,
        upserts = Seq((25L, "c-p2", "p2")).toDF("id", "payload", "part"),
        deleteKeys = spark.emptyDataset[Long].toDF("id"))
      Snapshot.merge(spark, t,
        upserts = Seq((15L, "d-p1", "p1")).toDF("id", "payload", "part"),
        deleteKeys = spark.emptyDataset[Long].toDF("id"))
      val c = Snapshot.commitStaged(spark, stagedC)
      assert(c.version == 5, "a disjoint stage rebases onto the concurrent commit")
      assert(rowsOf(t).contains((15L, "d-p1", "p1")) &&
        rowsOf(t).contains((25L, "c-p2", "p2")))
    }
  }

  test("threaded writers serialize through the conditional lock: every merge lands exactly once") {
    withConditionalStore {
      val t = s"file://${freshDir("graft_cond_threads")}/tbl"
      Snapshot.create(spark, t, seedDf, "id", "part")
      val failures = new java.util.concurrent.atomic.AtomicInteger(0)
      val failMsgs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val retried = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (0 until 4).map { w =>
        new Thread(() => {
          var done = false
          while (!done) {
            try {
              Snapshot.merge(spark, t,
                upserts = Seq((100L + w, s"w$w", "p1"))
                  .toDF("id", "payload", "part"),
                deleteKeys = spark.emptyDataset[Long].toDF("id"))
              done = true
            } catch {
              case _: Snapshot.ConcurrentCommitException =>
                retried.incrementAndGet(); Thread.sleep(50)
              case e: Throwable =>
                failMsgs.add(s"${e.getClass.getSimpleName}: ${e.getMessage}")
                failures.incrementAndGet(); done = true
            }
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(failures.get() == 0,
        s"${failures.get()} unexpected failures: " +
          failMsgs.asScala.mkString(" || ").take(800))
      assert(Snapshot.currentVersion(t) == 5,
        "4 writers = 4 commits, serialized by the conditional lock")
      val rows = rowsOf(t)
      (0 until 4).foreach(w => assert(rows.contains((100L + w, s"w$w", "p1"))))
      // the lock was contended at least once across 4 writers… not
      // guaranteed under extreme scheduling, so record rather than
      // assert: the correctness claims above are scheduling-free
      info(s"lock retries observed: ${retried.get()}")
    }
  }
}
