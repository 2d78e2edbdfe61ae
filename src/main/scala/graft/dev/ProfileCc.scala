package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle decomposition of the near-dup COMPONENT paths (dev tool):
  * attributes dedup_clusters' shuffle bytes to its internal stages so
  * the star+repair scheme's wins/regressions are diagnosable against
  * the full-pair path at any SF. */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def measure[T](label: String)(f: => T): T = {
      val l = new PlanAudit.MetricsListener
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(300) // let queued stage-completed events drain
      spark.sparkContext.removeSparkListener(l)
      println(f"[cc] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"shuffle ${l.shuffleWrite.sum / 1e6}%9.2f MB  input ${l.inputBytes.sum / 1e6}%9.2f MB")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    noop(docs.select(count(lit(1))))

    val st = measure("shingleStats") {
      graft.operators.Dedup.shingleStats(docs, col("text"), col("doc_id"))
    }
    // --- internal decomposition (mirrors nearDupComponents) ---
    val sigs = graft.operators.Dedup.shingleSigs(docs, col("text"), col("doc_id"), 3)
    measure("sigs materialize")(println(s"[cc]   sigs rows = ${sigs.count()}"))
    val threshold = 0.8
    val ordered = graft.functions.TextHashExprs.freqReorder(col("sh"), st.frequent)
    val prefixLen = (size(col("sh")) - ceil(lit(threshold) * size(col("sh"))) + 1).cast("int")
    val prefixes = graft.operators.OpCache.cache(
      sigs.select(col("doc_id"), size(col("sh")).as("sz"),
          posexplode(slice(ordered, lit(1), prefixLen)))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "ph"))
    measure("prefixes materialize")(println(s"[cc]   prefix rows = ${prefixes.count()}"))
    val bucketAgg = graft.operators.OpCache.cache(prefixes.groupBy(col("ph"))
      .agg(min(struct(col("doc_id"), col("sz"), col("p"))).as("lo"),
        max(struct(col("doc_id"), col("sz"), col("p"))).as("hi"),
        count(lit(1)).as("bsz")))
    measure("bucketAgg")(println(s"[cc]   buckets = ${bucketAgg.count()}, big = ${bucketAgg.filter(col("bsz") > 3).count()}"))
    val repRows = bucketAgg
      .select(col("ph"), explode(array(col("lo"), col("hi"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.sz").as("sz"),
        col("r.p").as("p"), col("ph"))
      .distinct()
    val minOverlap = ceil(lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")))
    val cond = col("a.ph") === col("b.ph") &&
      col("a.sz") >= lit(threshold) * col("b.sz") &&
      col("b.sz") >= lit(threshold) * col("a.sz") &&
      least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) >= minOverlap
    val starCand = graft.operators.OpCache.cache(
      repRows.as("a").join(prefixes.as("b"),
        col("a.doc_id") =!= col("b.doc_id") && cond)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct())
    measure("star candidates")(println(s"[cc]   star cand = ${starCand.count()}"))
    val fullCand = graft.operators.OpCache.cache(
      graft.operators.Dedup.prefixCandidates(sigs, threshold, freqOrdered = true,
        freqIn = Some(st.frequent)))
    measure("full candidates")(println(s"[cc]   full cand = ${fullCand.count()}"))
    def rescoreLocal(cand: DataFrame): DataFrame = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        .hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.VectorExprs.sortedIntersectCount(col("sh_a"), col("sh_b"))
          .cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
    measure("rescore(star)")(noop(rescoreLocal(starCand)))
    measure("rescore(full)")(noop(rescoreLocal(fullCand)))
    val edges = graft.operators.OpCache.cache(
      rescoreLocal(starCand).select("doc_a", "doc_b"))
    val labels = measure("CC(star edges)") {
      val l = graft.operators.Dedup.duplicateClusters(edges); noop(l); l
    }
    measure("repair round") {
      val prefBig = prefixes.join(
        bucketAgg.filter(col("bsz") > 3).select("ph"), Seq("ph"), "left_semi")
      val pl = prefBig.join(labels, Seq("doc_id"), "left")
        .withColumn("lbl", coalesce(col("cluster_id"), col("doc_id")))
        .drop("cluster_id")
      val cross = pl.as("a").join(pl.as("b"),
          col("a.doc_id") < col("b.doc_id") && cond && col("a.lbl") =!= col("b.lbl"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val fresh = cross.join(starCand, Seq("doc_a", "doc_b"), "left_anti")
      println(s"[cc]   frontier = ${fresh.count()}")
    }
    graft.operators.OpCache.releaseAll()
    measure("e2e nearDupComponents") {
      noop(graft.operators.Dedup.nearDupComponents(docs, col("text"),
        col("doc_id"), statsIn = Some(st)))
    }
    graft.operators.OpCache.releaseAll()
    measure("e2e full pairs+CC") {
      noop(graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.ngramJaccard(docs, col("text"), col("doc_id"),
          statsIn = Some(st))))
    }
    graft.operators.OpCache.releaseAll()
    val lshPairs = graft.operators.Dedup.minhashLshVerified(
      docs, col("text"), col("doc_id"))
    measure("lsh-verified pairs") {
      println(s"[cc]   lsh genuine pairs = ${lshPairs.count()}")
    }
    measure("e2e lsh pairs+CC") {
      noop(graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashLshVerified(docs, col("text"), col("doc_id"))))
    }
    graft.operators.OpCache.releaseAll()
    measure("e2e banded components") {
      noop(graft.operators.Dedup.nearDupComponents(docs, col("text"),
        col("doc_id"), candidates = "banded"))
    }
    graft.operators.OpCache.releaseAll()
    // banded internals
    locally {
      import graft.functions.TextHashExprs
      val both = graft.operators.OpCache.cache(docs
        .select(col("doc_id"),
            TextHashExprs.minhashWithShingles(col("text"), 3, 32).as("b"))
        .filter(col("b").isNotNull)
        .select(col("doc_id"), col("b.sig").as("sig"), col("b.sh").as("sh")))
      measure("b: both materialize")(println(s"[cc]   docs = ${both.count()}"))
      val banded = graft.operators.OpCache.cache(
        graft.operators.Dedup.bandFrame(both.select("doc_id", "sig"), 16, 2)
          .select(col("doc_id"), xxhash64(col("band"), col("band_hash")).as("bk")))
      val bucketAgg = graft.operators.OpCache.cache(banded.groupBy(col("bk"))
        .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
          count(lit(1)).as("bsz")))
      measure("b: bucketAgg")(println(
        s"[cc]   buckets = ${bucketAgg.count()}, big = ${bucketAgg.filter(col("bsz") > 3).count()}"))
      val repRows = bucketAgg
        .select(col("bk"), explode(array(col("lo"), col("hi"))).as("doc_id"))
        .distinct()
      val starCand = graft.operators.OpCache.cache(
        repRows.as("a").join(banded.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct())
      measure("b: star cand")(println(s"[cc]   star cand = ${starCand.count()}"))
      val edges = graft.operators.OpCache.cache(
        rescoreLocal(starCand).select("doc_a", "doc_b"))
      measure("b: rescore(star)")(println(s"[cc]   edges = ${edges.count()}"))
      val labels = measure("b: CC") {
        val l = graft.operators.Dedup.duplicateClusters(edges); noop(l); l
      }
      measure("b: repair round") {
        val bucketsBig = banded.join(
          bucketAgg.filter(col("bsz") > 3).select("bk"), Seq("bk"), "left_semi")
        val pl = bucketsBig.join(labels, Seq("doc_id"), "left")
          .withColumn("lbl", coalesce(col("cluster_id"), col("doc_id")))
          .drop("cluster_id")
        val cross = pl.as("a").join(pl.as("b"),
            col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id") &&
              col("a.lbl") =!= col("b.lbl"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val fresh = cross.join(starCand, Seq("doc_a", "doc_b"), "left_anti")
        println(s"[cc]   frontier = ${fresh.count()}")
      }
      graft.operators.OpCache.releaseAll()
    }
    // CLIQUE-HEAVY regime: 200 boilerplate families × 250 near-clones
    // each (the "page duplicated across a crawl" shape). One-wave
    // verification is C(250,2)·200 ≈ 6.2M array-carrying pairs; the
    // star collapses each clique at ~2·250 verifications.
    val cliques = spark.range(0, 50000).select(col("id").as("doc_id"),
      concat(
        array_join(transform(sequence(lit(1), lit(60)),
          i => substring(md5(concat((col("id") / 250).cast("long"), lit("_"), i)), 1, 8)),
          " "),
        lit(" c"), col("id")).as("text"))
      .repartition(32)
    noop(cliques)
    measure("clique one-wave (lsh+CC)") {
      noop(graft.operators.Dedup.nearDupClusters(cliques, col("text"), col("doc_id")))
    }
    graft.operators.OpCache.releaseAll()
    measure("clique star+repair") {
      noop(graft.operators.Dedup.nearDupComponents(cliques, col("text"),
        col("doc_id"), candidates = "banded"))
    }
    graft.operators.OpCache.releaseAll()
    // the `cluster_strategy: auto` decision variable, measured on both
    // corpus shapes — the pick must match the e2e winner above
    measure("auto pick (ordinary)") {
      val pick = graft.operators.Dedup.chooseClusterStrategy(
        docs, col("text"), col("doc_id"))
      println(s"[cc]   ordinary corpus -> $pick (one-wave wins e2e above)")
    }
    graft.operators.OpCache.releaseAll()
    measure("auto pick (clique)") {
      val pick = graft.operators.Dedup.chooseClusterStrategy(
        cliques, col("text"), col("doc_id"))
      println(s"[cc]   clique corpus -> $pick (star+repair wins e2e above)")
    }
    graft.operators.OpCache.releaseAll()
    spark.stop()
  }
}
