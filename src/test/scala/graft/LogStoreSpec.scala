package graft

import graft.operators.{HadoopLogStore, LocalLogStore, LogStore, Snapshot}
import org.apache.spark.sql.functions._

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * The [[LogStore]] fabric: the commit protocol must run identically
 * over the local java.nio store and the Hadoop FileSystem store. The
 * sandbox's available Hadoop fabric is `file://` (HDFS semantics map
 * 1:1 onto the same FileSystem API surface), so the Hadoop-impl
 * lifecycle here drives every Snapshot verb through scheme-qualified
 * URIs — exercising HadoopLogStore end-to-end.
 */
/** A delegating store the registry spec plugs in for the `file`
  * scheme — counts every call so the test can prove real commit
  * traffic flows through a REGISTERED class (the S3
  * conditional-write extension point, exercised end-to-end). */
class CountingLogStore extends LogStore {
  private def c[A](a: A): A = { CountingLogStore.calls.incrementAndGet(); a }
  override def exists(p: String) = c(HadoopLogStore.exists(p))
  override def isDirectory(p: String) = c(HadoopLogStore.isDirectory(p))
  override def read(p: String) = c(HadoopLogStore.read(p))
  override def putIfAbsent(p: String, b: Array[Byte]) = c(HadoopLogStore.putIfAbsent(p, b))
  override def putReplace(p: String, b: Array[Byte]) = c(HadoopLogStore.putReplace(p, b))
  override def list(p: String) = c(HadoopLogStore.list(p))
  override def mkdirs(p: String) = c(HadoopLogStore.mkdirs(p))
  override def createNew(p: String) = c(HadoopLogStore.createNew(p))
  override def delete(p: String) = c(HadoopLogStore.delete(p))
  override def deleteTree(p: String) = c(HadoopLogStore.deleteTree(p))
  override def rename(s: String, d: String) = c(HadoopLogStore.rename(s, d))
  override def modifiedTime(p: String) = c(HadoopLogStore.modifiedTime(p))
  override def size(p: String) = c(HadoopLogStore.size(p))
}
object CountingLogStore {
  val calls = new java.util.concurrent.atomic.AtomicLong(0)
}

class LogStoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("forPath routes: bare path -> local store, scheme-qualified URI -> Hadoop store") {
    assert(LogStore.forPath("/tmp/x") eq LocalLogStore)
    assert(LogStore.forPath("relative/dir") eq LocalLogStore)
    assert(LogStore.forPath("file:///tmp/x") eq HadoopLogStore)
    assert(LogStore.forPath("hdfs://nn:8020/warehouse/t") eq HadoopLogStore)
    assert(LogStore.forPath("s3a://bucket/prefix/t") eq HadoopLogStore)
  }

  test("store primitives agree across impls: putIfAbsent refuses, createNew is once, rename moves") {
    Seq[(String, String => String)](
      ("local", identity[String] _),
      ("hadoop", (d: String) => s"file://$d")
    ).foreach { case (label, wrap) =>
      val dir = wrap(freshDir(s"graft_logstore_prims_$label"))
      val st = LogStore.forPath(dir)
      st.mkdirs(s"$dir/a")
      assert(st.isDirectory(s"$dir/a") && !st.isDirectory(s"$dir/nope"), label)
      st.putIfAbsent(s"$dir/a/m.json", "one".getBytes)
      assert(new String(st.read(s"$dir/a/m.json")) == "one", label)
      intercept[FileAlreadyExistsException] {
        st.putIfAbsent(s"$dir/a/m.json", "two".getBytes)
      }
      assert(new String(st.read(s"$dir/a/m.json")) == "one",
        s"$label: losing publish must not clobber")
      st.putReplace(s"$dir/a/m.json", "three".getBytes)
      assert(new String(st.read(s"$dir/a/m.json")) == "three", label)
      // lock primitive: exactly one winner, modifiedTime readable
      assert(st.createNew(s"$dir/a/lock") && !st.createNew(s"$dir/a/lock"), label)
      assert(st.modifiedTime(s"$dir/a/lock") > 0, label)
      assert(st.delete(s"$dir/a/lock") && !st.delete(s"$dir/a/lock"), label)
      // listing + walk + sizes
      st.mkdirs(s"$dir/a/sub")
      st.putIfAbsent(s"$dir/a/sub/f1", "12345".getBytes)
      assert(st.list(s"$dir/a").toSet ==
        Set(("m.json", false), ("sub", true)), label)
      assert(st.walkFiles(s"$dir/a").toSet == Set("m.json", "sub/f1"), label)
      assert(st.size(s"$dir/a/sub/f1") == 5L, label)
      assert(st.sizeTree(s"$dir/a") == 5L + "three".length, label)
      // rename refuses an existing destination, moves otherwise
      intercept[Exception] { st.rename(s"$dir/a/sub", s"$dir/a/m.json") }
      st.rename(s"$dir/a/sub", s"$dir/a/sub2")
      assert(st.exists(s"$dir/a/sub2/f1") && !st.exists(s"$dir/a/sub"), label)
      st.deleteTree(s"$dir/a")
      assert(!st.exists(s"$dir/a"), label)
    }
  }

  test("custom store registry: spark.graft.logstore.<scheme> routes the scheme through a user class") {
    try {
      spark.conf.set("spark.graft.logstore.file", "graft.CountingLogStore")
      CountingLogStore.calls.set(0)
      val st = LogStore.forPath("file:///tmp/whatever")
      assert(st.isInstanceOf[CountingLogStore], s"got ${st.getClass}")
      // the registered store carries REAL snapshot traffic: a create
      // through a file:// path must route its manifest IO through it
      val t = s"file://${freshDir("graft_logstore_custom")}/tbl"
      Snapshot.create(spark, t, (0 until 8).map(i => (i.toLong, s"p${i % 2}"))
        .toDF("id", "part"), key = "id", partitionCol = "part")
      assert(CountingLogStore.calls.get() > 0,
        "commit-protocol IO must flow through the registered store")
      assert(Snapshot.readLatest(spark, t).count() == 8L)
      // other schemes keep the default routing
      assert(LogStore.forPath("hdfs://nn/t") eq HadoopLogStore)
      assert(LogStore.forPath("/tmp/x") eq LocalLogStore)
    } finally spark.conf.unset("spark.graft.logstore.file")
  }

  test("full snapshot lifecycle through the Hadoop store: create/merge/DML/time-travel/tags/vacuum on a file:// URI") {
    val t = s"file://${freshDir("graft_logstore_cycle")}/tbl"
    assert(LogStore.forPath(t) eq HadoopLogStore)
    val df = (0 until 40).map(i => (i.toLong, s"pay_$i", s"p${i / 10}"))
      .toDF("id", "payload", "part")
    Snapshot.create(spark, t, df, key = "id", partitionCol = "part",
      statsCols = Seq("id"), fileRanges = 2)
    assert(Snapshot.currentVersion(t) == 1)
    assert(Snapshot.readLatest(spark, t).count() == 40L)
    // merge: upsert + delete, one commit
    Snapshot.merge(spark, t,
      upserts = Seq((2L, "v2", "p0"), (41L, "new", "p4")).toDF("id", "payload", "part"),
      deleteKeys = Seq(7L).toDF("id"))
    val v2 = Snapshot.readLatest(spark, t)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(v2(2L) == "v2" && v2(41L) == "new" && !v2.contains(7L) &&
      v2.size == 40)
    // per-file bytes recorded through the Hadoop fabric too
    assert(Snapshot.readManifest(t, 2).files.forall(_.bytes > 0))
    // predicate DML (copy-on-write) + MoR delete
    Snapshot.updateWhere(spark, t, Seq(("id", 10L, 12L)),
      Map("payload" -> lit("upd")))
    Snapshot.deleteWhereMor(spark, t, Seq(("id", 20L, 21L)))
    val v4 = Snapshot.readLatest(spark, t)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(v4(10L) == "upd" && !v4.contains(20L) && v4.size == 38)
    // time travel + tags + history ride the same store
    assert(Snapshot.readAt(spark, t, 1).count() == 40L)
    Snapshot.tag(t, "cut-1", 2)
    assert(Snapshot.readTag(spark, t, "cut-1")
      .select("id", "payload").as[(Long, String)].collect().toMap == v2)
    assert(Snapshot.history(t).map(_._2) ==
      Seq("create", "merge", "update", "delete-mor"))
    assert(Snapshot.versionAtTime(t, Snapshot.committedAt(t, 2)) >= 2)
    // a second create refuses (manifest putIfAbsent), version intact
    intercept[Exception] { Snapshot.create(spark, t, df, "id", "part") }
    assert(Snapshot.currentVersion(t) == 4)
    // compact materializes the MoR delete; vacuum reclaims v1 files
    Snapshot.compact(spark, t, maxFilesPerPartition = 1)
    Snapshot.untag(t, "cut-1")
    val vs = Snapshot.vacuum(spark, t, retainLast = 1)
    assert(vs.filesDeleted > 0 && vs.manifestsDeleted > 0)
    assert(Snapshot.readLatest(spark, t)
      .select("id", "payload").as[(Long, String)].collect().toMap == v4)
    intercept[Exception] { Snapshot.readAt(spark, t, 1).collect() }
    // fsck is clean after the full cycle
    assert(Snapshot.fsck(spark, t).isEmpty)
  }

  test("writer mutual exclusion through the Hadoop store: a held lock refuses, release admits, stale locks steal") {
    val t = s"file://${freshDir("graft_logstore_lock")}/tbl"
    val df = (0 until 10).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part")
    Snapshot.create(spark, t, df, key = "id", partitionCol = "part")
    val st = LogStore.forPath(t)
    // a concurrent writer's lock (claimed through the same store
    // primitive Snapshot uses) refuses the commit, version untouched
    assert(st.createNew(s"$t/_log/_commit.lock"))
    intercept[Snapshot.ConcurrentCommitException] {
      Snapshot.merge(spark, t,
        upserts = Seq((99L, "p1")).toDF("id", "part"),
        deleteKeys = spark.range(0, 0).select(col("id").as("id")))
    }
    assert(Snapshot.currentVersion(t) == 1)
    st.delete(s"$t/_log/_commit.lock")
    Snapshot.merge(spark, t,
      upserts = Seq((99L, "p1")).toDF("id", "part"),
      deleteKeys = spark.range(0, 0).select(col("id").as("id")))
    assert(Snapshot.currentVersion(t) == 2)
    // a crashed writer's stale lock steals: age it past the threshold
    // via the local twin of the file:// path, then commit again
    assert(st.createNew(s"$t/_log/_commit.lock"))
    val local = java.nio.file.Paths.get(
      t.stripPrefix("file://") + "/_log/_commit.lock")
    java.nio.file.Files.setLastModifiedTime(local,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7 * 3600 * 1000L))
    Snapshot.merge(spark, t,
      upserts = Seq((100L, "p0")).toDF("id", "part"),
      deleteKeys = spark.range(0, 0).select(col("id").as("id")))
    assert(Snapshot.currentVersion(t) == 3,
      "a stale lock must be stolen, not wedge the table forever")
  }

  test("DSv2 and the optimistic path resolve through the store: staged merge + format(graft) on a file:// URI") {
    val t = s"file://${freshDir("dsv2")}/tbl"
    val df = (0 until 20).map(i => (i.toLong, s"pay_$i", s"p${i / 10}"))
      .toDF("id", "payload", "part")
    Snapshot.create(spark, t, df, key = "id", partitionCol = "part",
      statsCols = Seq("id"))
    // optimistic concurrency: stage (writes files/_staging-*), commit
    // (store rename), both through HadoopLogStore
    val staged = Snapshot.stageMerge(spark, t,
      // one rewritten key (p0 rewrites -> removed side nonempty) and
      // one new key in a new partition (added side)
      upserts = Seq((3L, "upd", "p0"), (99L, "opt", "p9"))
        .toDF("id", "payload", "part"),
      deleteKeys = spark.emptyDataset[Long].toDF("id"))
    Snapshot.commitStaged(spark, staged)
    assert(Snapshot.readLatest(spark, t)
      .filter(col("id") === 99L).select("payload").as[String].head() == "opt")
    // the connector reads the URI directly (resolve passes non-file:
    // paths through localizePath untouched only for other schemes;
    // file: unwraps to the same local path — either way it serves)
    val viaDsv2 = spark.read.format("graft").load(t)
    assert(viaDsv2.count() == 21L)
    // change feed over the URI
    val (removed, added) = Snapshot.changeSet(spark, t, 2)
    assert(added.count() > 0 && removed.count() > 0)
  }
}
