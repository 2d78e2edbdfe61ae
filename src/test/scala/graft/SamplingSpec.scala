package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("stratifiedSample: per-stratum fractions, deterministic, no shuffle") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .withColumn("stratum", (col("doc_id") % 2 === 0).cast("string"))
    val out = Sampling.stratifiedSample(df, col("stratum"), col("doc_id"),
      Map("true" -> 0.3))
    val total = df.filter(col("stratum") === "true").count().toDouble
    val kept = out.filter(col("stratum") === "true").count().toDouble
    assert(math.abs(kept / total - 0.3) < 0.1, s"kept $kept of $total")
    // unlisted stratum keeps the default fraction (1.0 → everything)
    assert(out.filter(col("stratum") === "false").count() ===
      df.filter(col("stratum") === "false").count())
    // keep-set is a pure function of the id — identical after repartition
    val again = Sampling.stratifiedSample(df.repartition(7), col("stratum"),
        col("doc_id"), Map("true" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
    // map-side only: no exchange in the sampling plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "stratified sampling must not shuffle")
  }

  test("clusterBalancedCap: nearest-pinned-centroid cells, per-cell md5 cap, null embeddings dropped") {
    // two well-separated pinned topics; 5 vectors near topic A, 2
    // near topic B, one null
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)), (3L, Seq(0.95, 0.05)),
      (4L, Seq(0.85, 0.15)), (5L, Seq(0.99, 0.01)),
      (6L, Seq(0.1, 0.9)), (7L, Seq(0.2, 0.8)),
      (8L, null.asInstanceOf[Seq[Double]]))
      .toDF("id", "emb")
    val out = Sampling.clusterBalancedCap(rows, col("id"), col("emb"),
      cents, maxN = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // topic A capped 5 -> 3; topic B kept whole; the null row gone
    assert(out.count(_._2 == 0) == 3)
    assert(out.count(_._2 == 1) == 2)
    assert(!out.exists(_._1 == 8L))
    assert(out.forall(_._3 <= 3))
    // the kept subset is the md5 hash order — recompute it
    val keptA = out.filter(_._2 == 0).map(_._1).toSet
    val wantA = Seq(1L, 2L, 3L, 4L, 5L)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(
        i.toString), i)).take(3).toSet
    assert(keptA == wantA)
  }

  test("packSequences: seq assignment equals the exclusive-cumsum formula") {
    val d = Seq((1L, 100L), (2L, 2000L), (3L, 30L), (4L, 500L), (5L, 1500L), (6L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packSequences(d, lit(0), col("doc_id"), col("n_tokens"),
        budget = 1024)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    // exclusive cumsums: 0, 100, 2100, 2130, 2630, 4130 → /1024 floor
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 4L))
  }

  test("packSequences: shards pack independently and conserve documents") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"),
        TextAnalysisCols.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val out = Sampling.packSequences(d, Sampling.hashBucket(col("doc_id")) % 4,
      col("doc_id"), col("n_tokens"), budget = 2048)
    assert(out.count() === d.count())
    // per (shard, seq) sums: every non-final sequence of a shard holds
    // at least one full budget of started tokens
    val seqs = out.groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("toks"))
      .select("shard", "seq_id", "toks").as[(Long, Long, Long)].collect()
    assert(seqs.map(_._1).distinct.length === 4)
    assert(seqs.forall(_._3 > 0))
  }

  test("chunking: windows tile the document with the configured overlap") {
    val text = ('a' to 'z').mkString * 40 // 1040 chars
    val out = graft.operators.Chunking.chunk(
        Seq((1L, text), (2L, "tiny"), (3L, "")).toDF("doc_id", "text"),
        col("text"), col("doc_id"), size = 500, overlap = 100)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // ceil((1040-100)/400) = 3 chunks at offsets 0, 400, 800
    assert(d1.length === 3)
    assert(d1(0) === text.substring(0, 500))
    assert(d1(1) === text.substring(400, 900))
    assert(d1(2) === text.substring(800))
    // short and empty docs come back whole as a single chunk
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq("tiny"))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq === Seq(""))
  }

  test("vocabDf counts documents, not occurrences") {
    val docs = Seq(
      (1L, "spark spark spark rules"),
      (2L, "spark is fast"),
      (3L, "duckdb is fast")).toDF("doc_id", "text")
    val out = graft.operators.Chunking.vocabDf(docs, col("text"), minDf = 2)
      .as[(String, Long)].collect().toMap
    assert(out === Map("spark" -> 2L, "is" -> 2L, "fast" -> 2L))
  }

  test("decontaminate drops benchmark matches incl. token-permuted paraphrases") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "fox brown quick the"), // permutation of the benchmark doc
      (3L, "completely different text")).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox").toDF("text")
    val out = Dedup.decontaminate(corpus, col("text"), bench, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(3L))
    // benchmark side is broadcast: no shuffle of the corpus
    val plan = Dedup.decontaminate(corpus, col("text"), bench, col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast anti join:\n$plan")
  }

  test("decontaminateBloom: parity with exact decontaminate, might_contain prefilter in plan") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.decontaminate(docs, col("text"), bench, col("text"))
      .select("doc_id").as[Long].collect().toSet
    val bloomed = Dedup.decontaminateBloom(docs, col("text"), bench, col("text"))
    assert(bloomed.select("doc_id").as[Long].collect().toSet === exact,
      "bloom path must be result-identical (no false negatives + exact rescore)")
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom predicate must reach the scan filter:\n$plan")
    // null content survives both paths
    val withNull = Seq((1L, "the quick brown fox"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val benchOne = Seq("the quick brown fox").toDF("text")
    val keptB = Dedup.decontaminateBloom(withNull, col("text"), benchOne, col("text"))
      .select("doc_id").as[Long].collect().toSet
    val keptE = Dedup.decontaminate(withNull, col("text"), benchOne, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptB === keptE && keptB === Set(2L))
  }

  test("capPerGroup: at most N per group, hash-deterministic across partitionings") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
    val out = Sampling.capPerGroup(df, col("source"), col("doc_id"), maxN = 10)
    val perGroup = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ <= 10), s"group over cap: $perGroup")
    assert(out.agg(max("grp_rank")).as[Long].head() <= 10L)
    val again = Sampling.capPerGroup(df.repartition(13), col("source"),
        col("doc_id"), maxN = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet,
      "kept set must be partitioning-independent")
  }

  test("quantileGate: per-group threshold, corpus side broadcast-joined") {
    val d = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 100L), ("b", 5L, 200L), ("b", 6L, 300L), ("b", 7L, 400L))
      .toDF("g", "id", "m")
    val out = Sampling.quantileGate(d, col("g"), col("m"), q = 0.5)
      .select("id").as[Long].collect().toSet
    // medians: a → 20, b → 250 (interpolated) ⇒ keep {2,3} and {6,7}
    assert(out === Set(2L, 3L, 6L, 7L))
    val plan = Sampling.quantileGate(d, col("g"), col("m"), q = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds must broadcast into a map-side filter:\n$plan")
  }

  test("upsampleEpochs: weight-many copies, zero drops, negative raises") {
    val d = Seq((1L, 3), (2L, 1), (3L, 0)).toDF("id", "w")
    val out = Sampling.upsampleEpochs(d, col("w"))
      .select("id", "epoch").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
    val neg = Seq((9L, -1)).toDF("id", "w")
    intercept[Exception] {
      Sampling.upsampleEpochs(neg, col("w")).collect()
    }
    // map-side only: no exchange
    assert(!Sampling.upsampleEpochs(d, col("w"))
      .queryExecution.executedPlan.toString.contains("Exchange"),
      "upsampling must not shuffle")
  }

  test("tokenBudgetPerGroup: prefix within budget, deterministic, leftover excluded") {
    val d = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("b", 4L, 500L), ("b", 5L, 500L)).toDF("g", "id", "tok")
    val out = Sampling.tokenBudgetPerGroup(d, col("g"), col("id"), col("tok"), 250L)
    val byG = out.select("g", "id", "tok_cumsum").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    // group a: at most 2 docs fit (100+100=200 <= 250, +100 > 250)
    assert(byG("a").length === 2 && byG("a").map(_._3).max === 200L)
    // group b: every doc alone exceeds the budget → nothing kept
    assert(!byG.contains("b"))
    val again = Sampling.tokenBudgetPerGroup(d.repartition(5), col("g"),
        col("id"), col("tok"), 250L)
      .select("id").as[Long].collect().toSet
    assert(again === out.select("id").as[Long].collect().toSet)
  }

  test("iqrOutliers: fences from exact quartiles, thresholds broadcast") {
    import graft.operators.StatsOp
    // group x: values 1..9 plus a wild 100 → 100 is the only outlier
    val rows = ((1 to 9).map(v => ("x", v.toDouble)) :+ ("x", 100.0)) ++
      Seq(("y", 5.0), ("y", 6.0))
    val d = rows.toDF("g", "v")
    val out = StatsOp.iqrOutliers(d, col("g"), col("v"))
    assert(out.filter(col("is_outlier")).select("v").as[Double].collect().toSeq
      === Seq(100.0))
    assert(out.count() === 12)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "fences must broadcast into a map-side flag")
  }

  test("dupRateByGroup: ratio of exact-duplicate mass per group") {
    import graft.operators.StatsOp
    val d = Seq(("a", "same"), ("a", "same"), ("a", "diff"),
      ("b", "u1"), ("b", "u2")).toDF("g", "t")
    val out = StatsOp.dupRateByGroup(d, col("g"), col("t"))
      .select("grp", "n_docs", "n_distinct", "dup_ratio")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 3L, 2L, 1.0 - 2.0 / 3.0)))
    assert(out("b") === (("b", 2L, 2L, 0.0)))
  }

  test("globalOrder: null ids drop and ranks stay dense from 1 (offset regression)") {
    val d = Seq(Some(1L), Some(2L), None, Some(3L), None)
      .toDF("id")
    val out = Sampling.globalOrder(d, col("id"), "z")
      .select("order_id").as[Long].collect().sorted.toSeq
    // null-id rows must not inflate the bucket offsets: the three
    // real rows rank exactly 1..3
    assert(out === Seq(1L, 2L, 3L))
    // and upsampled null weights drop instead of raising
    val w = Seq((1L, Some(2)), (2L, None)).toDF("id", "w")
    val up = Sampling.upsampleEpochs(w, col("w"))
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(up === Set((1L, 1L), (1L, 2L)))
  }

  test("takeExactly: precisely n rows, stable across partitionings and reruns") {
    val df = spark.read.parquet(sf() + "/documents.parquet").select("doc_id")
    val a = Sampling.takeExactly(df, col("doc_id"), 37L, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(a.size === 37)
    val b = Sampling.takeExactly(df.repartition(9), col("doc_id"), 37L, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(b === a)
    // a larger n is a superset: the permutation is a fixed order
    val c = Sampling.takeExactly(df, col("doc_id"), 80L, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("weightedSample: exact n, partitioning-invariant, weight-proportional") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val a = Sampling.weightedSample(df, col("doc_id"), col("n_chars"), 100L, "ws")
      .select("doc_id").as[Long].collect().toSet
    assert(a.size === 100)
    val b = Sampling.weightedSample(df.repartition(7), col("doc_id"), col("n_chars"),
        100L, "ws")
      .select("doc_id").as[Long].collect().toSet
    assert(b === a)
    // A-ES property: inclusion tracks weight — mean length of the
    // sample must exceed the corpus mean (lengths vary 48..~4k)
    val corpusMean = df.agg(avg("n_chars")).as[Double].collect().head
    val sampleMean = df.filter(col("doc_id").isInCollection(a))
      .agg(avg("n_chars")).as[Double].collect().head
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
    // degenerate: uniform weights reduce to an unweighted sample that
    // still returns exactly n
    val u = Sampling.weightedSample(df, col("doc_id"), lit(1.0), 50L, "ws")
    assert(u.count() === 50)
  }

  test("weightedSamplePerGroup: exact n per group, partitioning-invariant") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val out = Sampling.weightedSamplePerGroup(df, col("source"), col("doc_id"),
      col("n_chars"), nPerGroup = 5, seed = "g")
    val perGroup = out.groupBy("source").count().select("count")
      .as[Long].collect()
    assert(perGroup.forall(_ === 5L))
    val again = Sampling.weightedSamplePerGroup(df.repartition(9), col("source"),
        col("doc_id"), col("n_chars"), nPerGroup = 5, seed = "g")
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
  }

  test("exportShards: dense full shards, stable under repartitioning") {
    val df = spark.read.parquet(sf() + "/documents.parquet").select("doc_id")
    val n = df.count()
    val shards = Sampling.exportShards(df, col("doc_id"), "sh", docsPerShard = 16)
    val manifest = Sampling.shardManifest(shards)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // dense ids 0..k-1; every shard full except possibly the last
    assert(manifest.map(_._1).toSeq === manifest.indices.map(_.toLong))
    manifest.dropRight(1).foreach { case (_, cnt, _, _) => assert(cnt === 16L) }
    assert(manifest.map(_._2).sum === n)
    // order ranges tile [1, n] without overlap
    manifest.sliding(2).foreach {
      case Array((_, _, _, lastA), (_, _, firstB, _)) => assert(lastA + 1 === firstB)
      case _ =>
    }
    // assignment is partitioning-invariant
    val a = shards.select("doc_id", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.exportShards(df.repartition(11), col("doc_id"), "sh", 16)
      .select("doc_id", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("normalizeText: case, controls, punctuation, whitespace runs") {
    import graft.TextAnalysisCols
    val d = Seq((1L, "  Hello\u0007WORLD!!  foo\t\tbar  ")).toDF("id", "t")
    val out = d.select(
        TextAnalysisCols.normalizeText(col("t")).as("a"),
        TextAnalysisCols.normalizeText(col("t"), stripPunct = true).as("b"))
      .as[(String, String)].head()
    assert(out._1 === "hello world!! foo bar")
    assert(out._2 === "hello world foo bar")
    // scan-side only
    assert(!d.select(TextAnalysisCols.normalizeText(col("t")))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("globalOrder: exact global md5 rank without a single-reducer sort") {
    val df = spark.read.parquet(sf() + "/documents.parquet").select("doc_id")
    val out = Sampling.globalOrder(df, col("doc_id"), seed = "s42")
      .select("doc_id", "order_id").as[(Long, Long)].collect()
    val n = out.length
    assert(out.map(_._2).sorted.toSeq === (1L to n).toSeq,
      "order_id must be a dense 1..n permutation")
    // rank agrees with a driver-side sort of the same key
    def key(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("s42" + id).getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = out.map(_._1).sortBy(id => (key(id), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(out.map(t => t._1 -> t._2).toMap === expected)
    // the only window partitions by bucket — no global-order exchange
    val plan = Sampling.globalOrder(df, col("doc_id"), seed = "s42")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"global rank must not range-sort the corpus:\n$plan")
  }
}
