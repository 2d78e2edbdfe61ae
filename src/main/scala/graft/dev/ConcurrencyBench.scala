package graft.dev

import graft.operators.{LogStore, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicInteger, LongAdder}

/**
 * MULTI-WRITER evidence for the optimistic commit protocol — the r15
 * ask: staged commits have correctness specs (stageMerge/commitStaged
 * conflict matrix, ConditionalStoreSpec's race rounds) but no measured
 * throughput. N writer threads commit DISJOINT partitions/keys against
 * ONE table via the optimistic path (stage WITHOUT the lock →
 * commit-with-rebase under it — the design claim is that disjoint
 * writers serialize on milliseconds, not on each other's shuffles),
 * at 1 / 4 / 16 writers × {inline, seg} manifests.
 *
 * Per row: total commits landed, wall, commits/s, LOCK retries (a
 * commit attempt finding the lock held — the milliseconds-level
 * serialization), CONFLICT aborts (should be ZERO for disjoint
 * writers: any nonzero is a protocol bug this bench exists to flush
 * out), REBASED commits (landed atop a version newer than their
 * stage's read version) and the mean stage / publish walls — publish
 * split rebased vs clean, so the rebase overhead (two manifest reads
 * + the key-overlap probe over intervening files) is priced
 * explicitly.
 *
 * Emits one JSON line per row to `concurrencybench_out.json`
 * (override with SPARK_GRAFT_CONCBENCH_OUT).
 */
object ConcurrencyBench {

  private def rm(p: String): Unit = LogStore.forPath(p).deleteTree(p)

  private final case class RowStats(
      writers: Int, mode: String, commits: Int, wallS: Double,
      lockRetries: Int, conflicts: Int, rebased: Int,
      stageMeanS: Double, publishCleanMeanS: Double,
      publishRebasedMeanS: Double)

  private def run(spark: SparkSession, writers: Int, mode: String,
                  commitsPerWriter: Int): RowStats = {
    sys.props("graft.manifest.segmentThreshold") =
      if (mode == "seg") "4" else Int.MaxValue.toString
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_concbench_${mode}_$writers"
    rm(t)
    // seed: one partition per writer (disjoint ownership) + padding
    // partitions so the segmented manifest has carry-forward mass
    val seed = spark.range(0, 64).select(
      (col("id") * 1000000L).as("k"),
      concat(lit("w"), col("id") % 32).as("part"),
      lit("seed").as("payload"))
    Snapshot.create(spark, t, seed, "k", "part", statsCols = Seq("k"))

    val lockRetries = new AtomicInteger
    val conflicts = new AtomicInteger
    val rebased = new AtomicInteger
    val landed = new AtomicInteger
    val stageNs = new LongAdder
    val stageN = new AtomicInteger
    val pubCleanNs = new LongAdder
    val pubCleanN = new AtomicInteger
    val pubRebasedNs = new LongAdder
    val pubRebasedN = new AtomicInteger
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()

    def writerLoop(w: Int): Unit = try {
      var i = 0
      while (i < commitsPerWriter && failure.get() == null) {
        i += 1
        // writer-owned partition + globally unique keys: disjoint by
        // construction, the shape the optimistic path is FOR
        val ups = spark.range(0, 50).select(
          (lit(w.toLong * 1000000000L + i.toLong * 1000L) + col("id")).as("k"),
          lit(s"w$w").as("part"),
          lit(s"c$i").as("payload"))
        val dels = spark.range(0, 0).selectExpr("id as k")
        var done = false
        while (!done && failure.get() == null) {
          val t0 = System.nanoTime()
          val staged = Snapshot.stageMerge(spark, t, ups, dels)
          stageNs.add(System.nanoTime() - t0)
          stageN.incrementAndGet()
          try {
            var published = false
            while (!published) {
              val t1 = System.nanoTime()
              try {
                val st = Snapshot.commitStaged(spark, staged)
                val dt = System.nanoTime() - t1
                if (st.version > staged.readVersion + 1) {
                  rebased.incrementAndGet()
                  pubRebasedNs.add(dt); pubRebasedN.incrementAndGet()
                } else {
                  pubCleanNs.add(dt); pubCleanN.incrementAndGet()
                }
                landed.incrementAndGet()
                published = true
                done = true
              } catch {
                case _: Snapshot.ConcurrentCommitException =>
                  lockRetries.incrementAndGet()
                  Thread.sleep(5)
              }
            }
          } catch {
            case _: Snapshot.CommitConflictException =>
              // should never happen for disjoint writers — counted,
              // re-staged, and reported loudly in the row
              conflicts.incrementAndGet()
              staged.abort()
          }
        }
      }
    } catch { case e: Throwable => failure.compareAndSet(null, e) }

    val threads = (0 until writers).map(w =>
      new Thread(() => writerLoop(w), s"writer-$w"))
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    Option(failure.get()).foreach(e => throw new IllegalStateException(
      s"concurrency bench writer failed ($mode x$writers)", e))

    // post-conditions: every commit landed exactly once and the table
    // holds every writer's rows — a lost update would surface here
    val m = Snapshot.readManifest(t, Snapshot.currentVersion(t))
    require(m.version == 1 + landed.get(),
      s"version ${m.version} != 1 + ${landed.get()} commits")
    val expect = 64L + writers.toLong * commitsPerWriter * 50L
    val got = Snapshot.readLatest(spark, t).count()
    require(got == expect, s"rows $got != expected $expect (lost update?)")
    rm(t)

    def mean(ns: LongAdder, n: AtomicInteger): Double =
      if (n.get() == 0) 0.0 else ns.sum() / 1e9 / n.get()
    RowStats(writers, mode, landed.get(), wall, lockRetries.get(),
      conflicts.get(), rebased.get(), mean(stageNs, stageN),
      mean(pubCleanNs, pubCleanN), mean(pubRebasedNs, pubRebasedN))
  }

  def main(args: Array[String]): Unit = {
    val out = sys.env.getOrElse("SPARK_GRAFT_CONCBENCH_OUT",
      "concurrencybench_out.json")
    val commitsPerWriter =
      sys.env.getOrElse("SPARK_GRAFT_CONCBENCH_COMMITS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for (mode <- Seq("inline", "seg"); writers <- Seq(1, 4, 16)) {
      val r = run(spark, writers, mode, commitsPerWriter)
      val line =
        f"""{"writers":${r.writers},"mode":"${r.mode}","commits":${r.commits},""" +
          f""""wall_s":${r.wallS}%.3f,"commits_per_s":${r.commits / r.wallS}%.3f,""" +
          f""""lock_retries":${r.lockRetries},"conflicts":${r.conflicts},""" +
          f""""rebased":${r.rebased},"stage_mean_s":${r.stageMeanS}%.4f,""" +
          f""""publish_clean_mean_s":${r.publishCleanMeanS}%.4f,""" +
          f""""publish_rebased_mean_s":${r.publishRebasedMeanS}%.4f}"""
      println(line)
      lines += line
    }
    sys.props -= "graft.manifest.segmentThreshold"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
