package graft

import graft.operators.Snapshot


/** The delivery-bounds MEMO (r16, VERDICT r15 ask #4): the rebase
  * fast path's walk must cost O(1) manifest IO per (version, JVM)
  * instead of O(intervening) per publish — WITHOUT changing conflict
  * semantics. These specs pin the two sides: memo ≡ parse for every
  * bounds shape, and the drop+recreate staleness channel (the one way
  * a (table, version) key changes meaning) is closed by the v1-epoch
  * check, so a stale disjoint-looking bound can never skip the probe
  * that would have caught a true key conflict.
  */
class DeliveryMemoSpec extends SparkSpecBase {
  import spark.implicits._

  private def fresh(tag: String): String =
    freshDir(s"graft_dmspec_$tag")

  private def seed(keys: Range, part: String) =
    keys.map(k => (k.toLong, part, "seed")).toDF("k", "part", "payload")

  test("memo ≡ parse: writer-sourced entries serve exactly what a stream-parse of the manifest would, for every bounds shape") {
    val t = fresh("shapes")
    Snapshot.create(spark, t, seed(0 until 10, "p0"), "k", "part")
    // a delivering merge (real hull), a DML commit (empty hull), an
    // overwrite (unknown)
    Snapshot.merge(spark, t,
      (100 until 110).map(k => (k.toLong, "p1", "m")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.deleteWhere(spark, t, Seq(("k", 0, 1)))
    Snapshot.overwrite(spark, t,
      (0 until 10).map(k => (k.toLong, "p0", "ow")).toDF("k", "part", "payload"))
    val vs = 1 to Snapshot.currentVersion(t)
    // in-JVM: every writeManifest pre-populated the memo
    val fromMemo = vs.map(v => Snapshot.deliveryBoundsOf(t, v))
    Snapshot.clearDeliveryMemo()
    val fromParse = vs.map(v => Snapshot.deliveryBoundsOf(t, v))
    assert(fromMemo == fromParse)
    // shapes are what the protocol expects: create/merge deliver real
    // or empty hulls, the DML commit an EMPTY hull, overwrite UNKNOWN
    val m2 = fromParse(1) // the merge
    assert(m2.exists(kb => !kb.empty && kb.bounds.contains("k")))
    assert(m2.get.bounds("k").min.isDefined && m2.get.bounds("k").max.isDefined)
    assert(fromParse(2).exists(_.empty))   // DML: empty hull
    assert(fromParse(3).isEmpty)           // overwrite: unknown
    // and the parse pass itself memoized: a third read is identical
    assert(vs.map(v => Snapshot.deliveryBoundsOf(t, v)) == fromParse)
  }

  test("conflict semantics unchanged: disjoint rebase publishes without a probe, overlapping rebase still conflicts — memo warm or cold") {
    for (warm <- Seq(true, false)) {
      val t = fresh(s"sem$warm")
      Snapshot.create(spark, t, seed(0 until 10, "p0"), "k", "part")
      // disjoint: staged keys 100s, intervening delivers 200s
      val s1 = Snapshot.stageMerge(spark, t,
        (100 until 110).map(k => (k.toLong, "pa", "s1")).toDF("k", "part", "payload"),
        Seq.empty[Long].toDF("k"))
      Snapshot.merge(spark, t,
        (200 until 210).map(k => (k.toLong, "pb", "iv")).toDF("k", "part", "payload"),
        Seq.empty[Long].toDF("k"))
      if (!warm) Snapshot.clearDeliveryMemo()
      val st1 = Snapshot.commitStaged(spark, s1)
      assert(st1.version == 3) // rebased over the intervening commit
      // overlapping: staged keys 200s (the intervening commit's), in a
      // DIFFERENT partition so only the key probe can catch it
      val s2 = Snapshot.stageMerge(spark, t,
        (205 until 215).map(k => (k.toLong, "pc", "s2")).toDF("k", "part", "payload"),
        Seq.empty[Long].toDF("k"))
      Snapshot.merge(spark, t,
        (205 until 215).map(k => (k.toLong, "pd", "iv2")).toDF("k", "part", "payload"),
        Seq.empty[Long].toDF("k"))
      if (!warm) Snapshot.clearDeliveryMemo()
      intercept[Snapshot.CommitConflictException] {
        Snapshot.commitStaged(spark, s2)
      }
      s2.abort()
    }
  }

  test("vacuumed v1 = UNKNOWABLE epoch: the memo is never trusted on such a table, and the true conflict is still detected (cold walk every publish)") {
    val t = fresh("vacv1")
    Snapshot.create(spark, t, seed(0 until 10, "p0"), "k", "part")
    // burn versions so vacuum(retainLast=2) removes v1, then vacuum
    (1 to 3).foreach { i =>
      Snapshot.merge(spark, t,
        Seq((100L + i, "p1", s"m$i")).toDF("k", "part", "payload"),
        Seq.empty[Long].toDF("k"))
    }
    Snapshot.vacuum(spark, t, retainLast = 2)
    assert(!graft.operators.LogStore.forPath(t)
      .exists(s"$t/_log/v00000001.json"))
    // overlapping rebase on the v1-less table: a (0,0)-style epoch
    // sentinel would conflate "unknowable" with "unchanged" and could
    // keep dead entries; the conservative contract is cold-walk —
    // the conflict MUST be detected regardless of memo state
    val s1 = Snapshot.stageMerge(spark, t,
      (500 until 510).map(k => (k.toLong, "pa", "s1")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.merge(spark, t,
      (500 until 510).map(k => (k.toLong, "pb", "iv")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitStaged(spark, s1)
    }
    s1.abort()
    // and the disjoint shape still publishes fine (cold walk, parses)
    val s2 = Snapshot.stageMerge(spark, t,
      (700 until 710).map(k => (k.toLong, "pc", "s2")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.merge(spark, t,
      (800 until 810).map(k => (k.toLong, "pd", "iv2")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    val st = Snapshot.commitStaged(spark, s2)
    assert(st.version == Snapshot.currentVersion(t))
  }

  test("drop+recreate at the same path cannot serve a dead incarnation's bounds: the epoch check clears the memo and the true conflict is detected") {
    val t = fresh("epoch")
    // INCARNATION 1: build memo entries whose v2 bounds are keys 200s
    Snapshot.create(spark, t, seed(0 until 10, "p0"), "k", "part")
    val s1 = Snapshot.stageMerge(spark, t,
      (100 until 110).map(k => (k.toLong, "pa", "s1")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.merge(spark, t,
      (200 until 210).map(k => (k.toLong, "pb", "iv")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.commitStaged(spark, s1) // pins the epoch, warms the memo
    // INCARNATION 2 at the same path: v2 now DELIVERS keys 500s
    graft.operators.LogStore.forPath(t).deleteTree(t)
    Snapshot.create(spark, t, seed(0 until 10, "p0"), "k", "part")
    val s2 = Snapshot.stageMerge(spark, t,
      (500 until 510).map(k => (k.toLong, "pa", "s2")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    Snapshot.merge(spark, t,
      (500 until 510).map(k => (k.toLong, "pb", "iv2")).toDF("k", "part", "payload"),
      Seq.empty[Long].toDF("k"))
    // a STALE memo would serve incarnation 1's v2 hull (keys 200s —
    // disjoint from the staged 500s) and skip the probe: a silent
    // lost update. The epoch check must detect the recreate, drop the
    // dead entries, re-read the REAL v2 bounds (500s — overlap) and
    // run the probe, which finds the conflict.
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitStaged(spark, s2)
    }
    s2.abort()
  }
}
