package graft

import graft.meta._
import graft.operators._
import graft.sinks.Writers
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The metadata-driven dataflow engine: compiles a [[meta.DataflowSpec]]
 * into Spark plans and (optionally) writes its sinks
 * (reference: main.py:81-175 `run_pipeline`,
 * src/transformations.py:288-377 `apply_transformations`).
 *
 * Everything is lazy plan composition — no action happens in
 * [[plan]]; Catalyst sees the complete metadata-driven pipeline and
 * optimizes across transformation boundaries (e.g. a `select_columns`
 * late in the flow still prunes the source scan).
 */
object Dataflow {

  /** Compile all transformations; returns every named frame. */
  def plan(spark: SparkSession, flow: DataflowSpec,
           inputs: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    // the graft SQL kernels (hll_sketch/dd_sketch/… — mergeable sketch
    // aggregates in particular) must resolve inside `aggregate`/`sql`/
    // `filter` expressions of a JSON-declared flow; registration is
    // idempotent, so make the whole catalog reachable unconditionally
    graft.functions.GraftFunctions.register(spark)
    val sourceFrames: Map[String, DataFrame] =
      flow.sources.map(s => s.name -> Readers.read(spark, s)).toMap

    flow.transformations.foldLeft(inputs ++ sourceFrames) { (frames, t) =>
      def in = frames.getOrElse(t.input,
        throw new IllegalArgumentException(s"transformation '${t.name}': unknown input '${t.input}'"))
      t match {
        case s: NormalizeSpec =>
          frames + (s.output -> Normalize.normalizeFields(in, s.fields, s.autoFlattenNaming))
        case s: DropColumnsSpec =>
          frames + (s.output -> Projection.dropColumns(in, s.columns))
        case s: SelectColumnsSpec =>
          frames + (s.output -> Projection.selectColumns(in, s.columns))
        case s: AddFieldsSpec =>
          frames + (s.output -> Projection.addFields(in, s.fields))
        case s: ValidateSpec =>
          val (ok, ko) = Validate.split(in, s.rules)
          frames + (s.okOutput -> ok) + (s.koOutput -> ko)
        case s: FilterSpec =>
          frames + (s.output -> in.filter(org.apache.spark.sql.functions.expr(s.condition)))
        case s: JoinSpec =>
          val right = frames.getOrElse(s.rightInput,
            throw new IllegalArgumentException(
              s"join '${s.name}': unknown right input '${s.rightInput}'"))
          // pre-flight cardinality hint: when the spec points at
          // persisted CMS sketches of both join keys, log the
          // cms_join_size estimate (one-sided: never under) BEFORE
          // the join plans. Sketch-sized IO, no job over the facts,
          // and strictly a log — the plan below is unchanged.
          for (lp <- s.leftSketch; rp <- s.rightSketch) {
            // the hint is advisory: a missing/malformed sketch log
            // must not fail the pipeline it merely annotates
            try {
              val est = joinSizeHint(spark, lp, rp)
              println(s"[dataflow] join '${s.name}': estimated join " +
                s"cardinality <= $est (cms_join_size over $lp x $rp)")
            } catch {
              case scala.util.control.NonFatal(e) =>
                println(s"[dataflow] join '${s.name}': cardinality " +
                  s"pre-flight skipped (${e.getMessage})")
            }
          }
          val (l, r) = s.broadcastSide.map(_.toLowerCase) match {
            case Some("left")  => (org.apache.spark.sql.functions.broadcast(in), right)
            case Some("right") => (in, org.apache.spark.sql.functions.broadcast(right))
            case _             => (in, right)
          }
          frames + (s.output -> l.join(r, s.on, s.how))
        case s: AggregateSpec =>
          import org.apache.spark.sql.functions.{col, expr}
          val aggs = s.aggs.map(a => expr(a.expr).as(a.name))
          val out =
            if (s.groupBy.isEmpty) in.agg(aggs.head, aggs.tail: _*)
            else in.groupBy(s.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
          frames + (s.output -> out)
        case s: SqlSpec =>
          // every named frame is visible to the query as a temp view
          frames.foreach { case (n, df) => df.createOrReplaceTempView(n) }
          frames + (s.output -> spark.sql(s.query))
        case s: DedupTransformSpec =>
          import org.apache.spark.sql.functions.col
          val content = col(s.contentCol)
          val id = col(s.idCol)
          // stats_path: load the train-once ShingleStats artifact
          // when present; compute-and-save when not (the scheduled
          // re-run then skips the frequency aggregation entirely)
          def jaccardStats = s.statsPath.map { p =>
            if (graft.operators.LogStore.forPath(p).exists(p))
              Dedup.loadShingleStats(p)
            else {
              val st = Dedup.shingleStats(in, content, id)
              Dedup.saveShingleStats(p, st)
              st
            }
          }
          def pairs = s.method match {
            case "ngram_jaccard" =>
              Dedup.ngramJaccard(in, content, id, threshold = s.threshold,
                statsIn = jaccardStats)
            case "minhash_lsh" =>
              Dedup.minhashLshVerified(in, content, id, threshold = s.threshold)
            case "simhash" =>
              Dedup.simhash(in, content, id)
            case "embedding_cosine" =>
              Similarity.lshDupPairs(in, id, content, threshold = s.threshold)
                .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
            case other =>
              throw new IllegalArgumentException(s"dedup '${s.name}': unknown method '$other'")
          }
          // cluster consumers never need the quadratic exact pair
          // set — the set-similarity methods route to banded-LSH
          // candidates (volume tracks duplicate mass, not Σdf²):
          // one_wave for ordinary corpora, star_repair for the
          // clique-heavy regime, auto (default) picks from the
          // measured band-bucket candidate-mass skew. Both banded
          // strategies carry the standard LSH miss probability on
          // just-above-threshold pairs ((1−t²)^16 — ~8e-8 at t=0.8
          // but ~1% at t=0.5); `exact` keeps the prefix-filter
          // no-false-negative guarantee (labels ≡
          // duplicateClusters(ngramJaccard)) at Σdf²-shaped candidate
          // cost. Other methods' pair frames feed the CC directly.
          require(Set("auto", "one_wave", "star_repair", "exact")
              .contains(s.clusterStrategy),
            s"dedup '${s.name}': unknown cluster_strategy '${s.clusterStrategy}'")
          def clusters = s.method match {
            case "ngram_jaccard" | "minhash_lsh" =>
              val strat = s.clusterStrategy match {
                case "auto" => Dedup.chooseClusterStrategy(in, content, id)
                case other => other
              }
              strat match {
                case "exact" =>
                  Dedup.nearDupComponents(in, content, id,
                    threshold = s.threshold, candidates = "prefix",
                    statsIn = jaccardStats)
                case "star_repair" =>
                  Dedup.nearDupComponents(in, content, id,
                    threshold = s.threshold, candidates = "banded")
                case _ =>
                  Dedup.nearDupClusters(in, content, id, threshold = s.threshold)
              }
            case _ => Dedup.duplicateClusters(pairs)
          }
          val validModes = Set("filter", "pairs", "clusters", "cluster_filter",
            "keep_best")
          require(validModes.contains(s.mode),
            s"dedup '${s.name}': unknown mode '${s.mode}' (expected one of ${validModes.mkString(", ")})")
          require(s.method != "exact" || s.mode == "filter" || s.mode == "pairs",
            s"dedup '${s.name}': mode '${s.mode}' needs a near-dup method (exact dedup has no pair graph)")
          val out = (s.method, s.mode) match {
            case ("exact", "pairs") =>
              // the duplicate-group report frame itself: one row per
              // distinct content with its canonical id + copy count
              Dedup.exact(in, content, id)
            case ("exact", _) =>
              // one canonical row (min id) per distinct content
              in.join(Dedup.exact(in, content, id)
                  .select(col("doc_id").as(s.idCol)), Seq(s.idCol), "left_semi")
            case (_, "pairs") => pairs
            case (_, "clusters") =>
              // connected-component labels over the near-dup graph
              clusters
            case (_, "cluster_filter") =>
              // keep only each component's min-id canonical (plus
              // rows that appear in no pair at all)
              in.join(clusters
                  .filter(col("cluster_id") =!= col("doc_id"))
                  .select(col("doc_id").as(s.idCol)),
                Seq(s.idCol), "left_anti")
            case (_, "keep_best") =>
              // quality-aware canonical: each component survives
              // through its highest-scored member (default score:
              // content length)
              val score = s.scoreCol.map(col).getOrElse(
                org.apache.spark.sql.functions.length(content).cast("double"))
              Dedup.dedupKeepBestClusters(in, id, score, clusters)
            case (_, _) =>
              // drop the higher id of every near-dup pair
              in.join(pairs.select(col("doc_b").as(s.idCol)).distinct(),
                Seq(s.idCol), "left_anti")
          }
          frames + (s.output -> out)
        case s: TextAnalysisSpec =>
          import org.apache.spark.sql.functions._
          val c = col(s.contentCol)
          val out = s.analyses.foldLeft(in) { (df, a) => a match {
            case "tokens" => df
              .withColumn("n_ws_tokens", TextAnalysisCols.wsTokenCount(c))
              .withColumn("n_bpe_tokens", TextAnalysisCols.bpeTokenCount(c))
            case "quality" =>
              df.select(col("*") +: TextAnalysisCols.qualityFeatures(c): _*)
            case "langid" =>
              df.withColumn("lang_pred", TextAnalysisCols.langId(c))
            case "fingerprint" => df
              .withColumn("fp_exact", md5(c))
              .withColumn("fp_norm", TextAnalysisCols.normFingerprint(c))
            case "repetition" =>
              val toks = TextAnalysisCols.wsTokens(lower(c))
              val n = size(toks)
              df.withColumn("repetition_ratio",
                when(n === 0, lit(0.0))
                  .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / n))
            case "redact" => df
              .withColumn("text_redacted", graft.functions.Redaction.redactPii(c))
              .withColumn("n_pii", graft.functions.Redaction.piiCount(c))
            case "gopher" =>
              df.select(col("*") +: TextAnalysisCols.gopherFeatures(c): _*)
            case "gopher_rep" =>
              df.select(col("*") +: TextAnalysisCols.gopherRepFeatures(c): _*)
            case "script" =>
              df.select(col("*") +: TextAnalysisCols.scriptProfile(c): _*)
            case "blocklist" =>
              require(s.blocklistTerms.nonEmpty,
                s"text_analysis '${s.name}': analysis 'blocklist' needs a " +
                  "non-empty blocklist_terms list")
              df.withColumn("n_blocked",
                TextAnalysisCols.blocklistHits(c, s.blocklistTerms))
            case "entropy" =>
              val e = graft.functions.TextFeatures.entropyStruct(c)
              df.withColumn("n_codepoints", e.getField("n_codepoints"))
                .withColumn("n_distinct_chars", e.getField("n_distinct_chars"))
                .withColumn("char_entropy", e.getField("char_entropy"))
                .withColumn("entropy_ratio", e.getField("entropy_ratio"))
            case other =>
              throw new IllegalArgumentException(
                s"text_analysis '${s.name}': unknown analysis '$other'")
          }}
          frames + (s.output -> out)
        case s: ChunkSpec =>
          frames + (s.output -> Chunking.chunk(in,
            org.apache.spark.sql.functions.col(s.contentCol),
            org.apache.spark.sql.functions.col(s.idCol), s.size, s.overlap))
        case s: RrfSpec =>
          val ranked = s.rankedInputs.map { f =>
            f -> frames.getOrElse(f, throw new IllegalArgumentException(
              s"rrf '${s.name}': unknown ranked input '$f'")) }
          frames + (s.output -> Search.rrfFuse(ranked, s.fuseK, s.topK))
        case s: Scd2Spec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Versioning.scd2(in,
            col(s.keyCol), col(s.tsCol), col(s.attrCol), col(s.tieCol)))
        case s: PageRankSpec =>
          import org.apache.spark.sql.functions.col
          val edges = in.select(col(s.srcCol).as("src"), col(s.dstCol).as("dst"))
          frames + (s.output ->
            Graph.pageRank(edges, s.iterations, convergeL1 = s.convergeL1))
        case s: ExpectSpec =>
          import org.apache.spark.sql.functions.col
          val checks = s.checks.map(Expectations.parse(_,
            f => frames.getOrElse(f, throw new IllegalArgumentException(
              s"expect '${s.name}': unknown reference frame '$f'"))))
          val rep = Expectations.report(in, checks)
          if (s.failOnViolation) {
            val bad = rep.filter(!col("ok")).collect()
            if (bad.nonEmpty) throw new IllegalStateException(
              s"expectations '${s.name}' failed: " + bad.map(r =>
                s"${r.getString(0)} (observed=${r.getLong(2)})").mkString("; "))
          }
          frames + (s.output -> rep)
        case s: DecontaminateSpec =>
          val bench = frames.getOrElse(s.benchInput,
            throw new IllegalArgumentException(
              s"decontaminate '${s.name}': unknown bench input '${s.benchInput}'"))
          frames + (s.output -> Dedup.decontaminate(in,
            org.apache.spark.sql.functions.col(s.contentCol),
            bench, org.apache.spark.sql.functions.col(s.benchContentCol)))
        case s: AnnSpec =>
          import org.apache.spark.sql.functions.col
          val idC = col(s.idCol)
          val vecC = col(s.vecCol)
          // cross-frame serving: `input` is the corpus, queries_input
          // the query batch (ivf/brute only — the top-k contract)
          val queriesFrame = s.queriesInput.map(q => frames.getOrElse(q,
            throw new IllegalArgumentException(
              s"ann '${s.name}': unknown queries_input '$q'")))
          require(queriesFrame.isEmpty || Set("ivf", "brute")(s.method),
            s"ann '${s.name}': queries_input supports methods ivf|brute " +
              s"(got '${s.method}')")
          require(s.where.isEmpty || s.method == "ivf",
            s"ann '${s.name}': where (filtered ANN) supports method ivf " +
              s"(got '${s.method}')")
          val out = s.method match {
            case "lsh" =>
              Similarity.lshTopK(in, idC, vecC, s.k, s.tables, s.bits)
            case "ivf" =>
              val cb = s.codebookPath.map(Similarity.loadCentroids)
              val corpus = s.where.map(w => in.filter(
                org.apache.spark.sql.functions.expr(w))).getOrElse(in)
              queriesFrame match {
                case Some(qf) =>
                  Similarity.ivfSearch(qf, corpus, idC, vecC, s.k, s.nlist, s.nprobe, cb)
                case None =>
                  Similarity.ivfTopK(corpus, idC, vecC, s.k, s.nlist, s.nprobe, cb)
              }
            case "brute" =>
              Similarity.bruteForceTopK(queriesFrame.getOrElse(in), in, idC, vecC, s.k)
            case "ivf_pq" =>
              // both codebooks are train-once artifacts; paths load
              // them, absence trains here (same sizing as `ivf`)
              val cells = s.codebookPath.map(Similarity.loadCentroids).getOrElse {
                val lists = if (s.nlist > 0) s.nlist
                  else math.max(16, math.ceil(math.sqrt(Scale.estimatedRows(in))).toInt)
                Similarity.trainKmeans(in, idC, vecC, lists)
              }
              val pq = s.pqPath.map(Similarity.loadPqCodebook)
                .getOrElse(Similarity.trainPqCodebook(in, idC, vecC))
              val probes = if (s.nprobe > 0) s.nprobe else math.max(4, cells.length / 8)
              Similarity.ivfPqTopK(in, idC, vecC, s.k, probes, cells, pq)
            case "semdedup" =>
              // codebook from the persisted artifact when given, else
              // trained here (same auto-sizing as ivfTopK)
              val cents = s.codebookPath.map(Similarity.loadCentroids).getOrElse {
                val lists = if (s.nlist > 0) s.nlist
                  else math.max(16, math.ceil(math.sqrt(Scale.estimatedRows(in))).toInt)
                Similarity.trainKmeans(in, idC, vecC, lists)
              }
              Similarity.semDedup(in, idC, vecC, cents, s.threshold)
            case other =>
              throw new IllegalArgumentException(s"ann '${s.name}': unknown method '$other'")
          }
          frames + (s.output -> out)
        case s: ClassifySpec =>
          import org.apache.spark.sql.functions.col
          val weights = s.weightsPath
            .map(p => Scoring.loadWeights(spark, p, s.buckets))
            .getOrElse(Scoring.syntheticWeights(s.buckets))
          frames + (s.output -> Scoring.classifyQuality(
            in, col(s.contentCol), weights, s.bias, s.threshold))
        case s: VersionDeltaSpec =>
          import org.apache.spark.sql.functions.col
          val neu = frames.getOrElse(s.newInput,
            throw new IllegalArgumentException(
              s"version_delta '${s.name}': unknown new input '${s.newInput}'"))
          frames + (s.output -> Versioning.delta(in, neu,
            col(s.idCol), col(s.contentCol), col(s.idCol), col(s.contentCol)))
        case s: ShardSpec =>
          frames + (s.output -> Sampling.exportShards(in,
            org.apache.spark.sql.functions.col(s.idCol), s.seed, s.docsPerShard))
        case s: FunnelSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Funnel.counts(in,
            col(s.userCol), col(s.ordCol), col(s.typeCol), s.steps))
        case s: CohortSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Funnel.cohortRetention(in,
            col(s.userCol), col(s.tsCol), col(s.typeCol), s.cohortType))
        case s: FuzzySpec =>
          import org.apache.spark.sql.functions.{col, substring}
          val blk = (k: org.apache.spark.sql.Column) => substring(k, 1, s.blockPrefix)
          val pairs = s.method match {
            case "levenshtein" => Fuzzy.selfFuzzyPairs(
              in, col(s.idCol), col(s.keyCol), blk, maxDist = s.maxDist)
            case "jaro_winkler" => Fuzzy.selfSimilarityPairs(
              in, col(s.idCol), col(s.keyCol), blk, minSim = s.minSim)
            case other => throw new IllegalArgumentException(
              s"fuzzy '${s.name}': unknown method '$other' (levenshtein|jaro_winkler)")
          }
          frames + (s.output -> pairs)
        case s: FamiliaritySpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Chunking.lexicalFamiliarity(
            in, col(s.contentCol), col(s.idCol), s.minDf))
        case s: DupNgramCoverageSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Dedup.dupNgramCoverage(
            in, col(s.contentCol), col(s.idCol), s.n, s.minDocs))
        case s: SplitSpec =>
          frames + (s.output -> Sampling.hashSplit(
            in, org.apache.spark.sql.functions.col(s.idCol), s.trainPct, s.valPct))
        case s: StratifiedSampleSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Sampling.stratifiedSample(
            in, col(s.strataCol), col(s.idCol), s.fractions, s.defaultFraction))
        case s: PackSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Sampling.packSequences(in,
            shard = Sampling.hashBucket(col(s.idCol)) % s.shards,
            id = col(s.idCol), tokens = col(s.tokensCol), budget = s.budget))
        case s: MixSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Sampling.sqrtTemperatureMix(
            in, col(s.strataCol), col(s.idCol)))
        case s: SearchSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Search.bm25(
            in, col(s.contentCol), col(s.idCol), s.terms, topK = s.k))
        case s: CentroidsSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Similarity.labelCentroids(
            in, col(s.labelCol), col(s.vecCol)))
        case s: KeyHistogramSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> (s.method match {
            case "exact" => StatsOp.keyHistogram(in, col(s.keyCol), s.topN)
            case "cms" => StatsOp.keyHistogramApprox(in, col(s.keyCol), s.topN)
            case other => throw new IllegalArgumentException(
              s"key_histogram '${s.name}': unknown method '$other' (exact|cms)")
          }))
        case s: TopSpansSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Dedup.topSpans(
            in, col(s.contentCol), col(s.idCol), w = s.window, k = s.k))
        case s: QuantizeSpec =>
          frames + (s.output -> Similarity.quantizeInt8(in, s.idCol, s.vecCol))
        case s: CapSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Sampling.capPerGroup(
            in, col(s.groupCol), col(s.idCol), s.maxN))
        case s: QuantileGateSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Sampling.quantileGate(
            in, col(s.groupCol), col(s.metricCol), s.q))
        case s: UpsampleSpec =>
          frames + (s.output -> Sampling.upsampleEpochs(
            in, org.apache.spark.sql.functions.expr(s.weightExpr)))
        case s: GlobalOrderSpec =>
          frames + (s.output -> Sampling.globalOrder(
            in, org.apache.spark.sql.functions.col(s.idCol), s.seed))
        case s: BoilerplateSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Chunking.stripBoilerplate(
            in, col(s.contentCol), col(s.idCol), col(s.sourceCol), s.minDf))
        case s: ParagraphDedupSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Dedup.dedupParagraphs(
            in, col(s.contentCol), col(s.idCol)))
        case s: C4CleanSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Chunking.c4Clean(
            in, col(s.contentCol), col(s.idCol), s.minWords))
        case s: SentencesSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Chunking.sentences(
            in, col(s.contentCol), col(s.idCol)))
        case s: NormalizeTextSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> in.withColumn("text_norm",
            TextAnalysisCols.normalizeText(col(s.contentCol), s.stripPunct)))
        case s: TakeSpec =>
          frames + (s.output -> Sampling.takeExactly(
            in, org.apache.spark.sql.functions.col(s.idCol), s.n, s.seed))
        case s: WeightedSampleSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output ->
            (if (s.groupCol.isEmpty)
              Sampling.weightedSample(in, col(s.idCol), col(s.weightCol), s.n, s.seed)
            else {
              // toIntExact, not toInt: a spec n above Int.MaxValue must
              // fail loudly at plan time, not silently wrap to a tiny
              // per-group sample
              require(s.n <= Int.MaxValue,
                s"weighted_sample '${s.name}': per-group n=${s.n} exceeds " +
                  s"Int.MaxValue (${Int.MaxValue})")
              Sampling.weightedSamplePerGroup(in, col(s.groupCol),
                col(s.idCol), col(s.weightCol), Math.toIntExact(s.n), s.seed)
            }))
        case s: LmScoreSpec =>
          import org.apache.spark.sql.functions.col
          val ref = if (s.referenceInput.isEmpty) in
            else frames.getOrElse(s.referenceInput,
              throw new IllegalArgumentException(
                s"lm_score '${s.name}': unknown reference input '${s.referenceInput}'"))
          val uni = LanguageModel.unigramCounts(ref, col(s.contentCol))
          val big = LanguageModel.bigramCounts(ref, col(s.contentCol), s.minCount)
          frames + (s.output -> LanguageModel.perplexity(
              in, col(s.idCol), col(s.contentCol), uni, big, s.alpha)
            .withColumnRenamed("id", s.idCol))
        case s: SubstringDedupSpec =>
          import org.apache.spark.sql.functions.col
          frames + (s.output -> Dedup.dedupSubstrings(
            in, col(s.contentCol), col(s.idCol), s.window))
        case s: BpeTokenizeSpec =>
          import org.apache.spark.sql.functions.col
          val merges =
            if (s.mergesPath.nonEmpty) Bpe.loadMerges(spark, s.mergesPath)
            else Bpe.trainMerges(in, col(s.contentCol), s.numMerges)
          frames + (s.output -> in.withColumn("bpe_tokens",
            Bpe.encode(col(s.contentCol), merges)))
        case s: ComputeStatsSpec =>
          // stats become named frames; sink them like any other
          // output. The input passes through under the transform name
          // (reference: src/transformations.py:373) so later steps can
          // chain off a compute_stats node.
          val (approxDistinct, portable) = s.distinctMode match {
            case "auto" => (None, false)
            case "exact" => (Some(false), false)
            case "approx" => (Some(true), false)
            case "approx_portable" => (Some(true), true)
            case other => throw new IllegalArgumentException(
              s"compute_stats '${s.name}': unknown distinct_mode '$other' " +
                "(auto|exact|approx|approx_portable)")
          }
          val stats = StatsOp.fieldStats(in, s.fields.getOrElse(Nil),
            approxDistinct, portable)
          val withField = frames + (s"${s.name}_fields" -> stats) + (s.name -> in)
          (s.okInput.flatMap(frames.get), s.koInput.flatMap(frames.get)) match {
            case (Some(ok), Some(ko)) if s.includeValidationStats =>
              withField +
                (s"${s.name}_validation" -> StatsOp.validationStatsFromSplit(ok, ko)) +
                (s"${s.name}_top_errors" -> StatsOp.topErrors(ko))
            case _ => withField
          }
      }
    }
  }

  /** Union every sketch row at `path` (parquet with a binary `sketch`
    * column, as `cms_sketch` persists) and estimate the inner-join
    * cardinality of the two sketched key columns with
    * [[graft.functions.CmsExprs.cmsJoinSize]]. One-sided (never
    * under-estimates); sketch-sized IO only — the facts themselves
    * are never read. */
  def joinSizeHint(spark: SparkSession, leftPath: String,
                   rightPath: String): Long = {
    import org.apache.spark.sql.functions.col
    val l = spark.read.parquet(leftPath)
      .agg(graft.functions.CmsExprs.cmsUnion(col("sketch")).as("lsk"))
    val r = spark.read.parquet(rightPath)
      .agg(graft.functions.CmsExprs.cmsUnion(col("sketch")).as("rsk"))
    l.crossJoin(r)
      .select(graft.functions.CmsExprs.cmsJoinSize(col("lsk"), col("rsk"))
        .as("est"))
      .first().getLong(0)
  }

  /** Plan + write all sinks and stats JSON outputs. Returns the
    * frames for inspection. */
  def run(spark: SparkSession, flow: DataflowSpec,
          inputs: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    val frames = plan(spark, flow, inputs)
    flow.transformations.foreach {
      case s: ComputeStatsSpec if s.outputPath.isDefined =>
        StatsOp.writeStatsJson(s.name, s.outputPath.get,
          frames(s"${s.name}_fields"),
          frames.get(s"${s.name}_validation"),
          frames.get(s"${s.name}_top_errors"))
      case _ =>
    }
    flow.sinks.foreach { sink =>
      val df = frames.getOrElse(sink.input,
        throw new IllegalArgumentException(s"sink '${sink.name}': unknown input '${sink.input}'"))
      Writers.write(df, sink)
    }
    frames
  }
}
