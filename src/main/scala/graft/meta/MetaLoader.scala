package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}


import scala.jdk.CollectionConverters._

/**
 * Parses a pipeline-spec JSON (same shape as the reference's
 * metadata_motor.json — reference: src/metadata_loader.py:11-24) into
 * the typed [[PipelineSpec]] model. Explicit JsonNode navigation, no
 * reflection: schema errors surface as readable exceptions naming the
 * offending node.
 */
object MetaLoader {

  private val mapper = new ObjectMapper()

  def loadFile(path: String): PipelineSpec =
    loadString(new String(
      graft.operators.LogStore.forPath(path).read(path), "UTF-8"))

  def loadString(json: String): PipelineSpec = {
    val root = mapper.readTree(json)
    val schedule = Option(root.get("schedule")).map(s =>
      ScheduleSpec(
        interval = str(s, "interval"),
        anchor = str(s, "anchor"),
        // asBoolean(default) coerces textual "false"/"true" too — a
        // quoted value must not silently trigger a full backfill
        catchup = s.path("catchup").asBoolean(true),
        retries = s.path("retries").asInt(0),
        retryDelayMinutes = s.path("retry_delay_minutes").asLong(5)))
    PipelineSpec(arr(root, "dataflows").map(parseDataflow), schedule)
  }

  private def parseDataflow(n: JsonNode): DataflowSpec =
    DataflowSpec(
      name = str(n, "name"),
      sources = arr(n, "sources").map(parseSource),
      transformations = arr(n, "transformations").map(parseTransform),
      sinks = arr(n, "sinks").map(parseSink))

  private def parseSource(n: JsonNode): SourceSpec =
    SourceSpec(
      name = str(n, "name"),
      path = str(n, "path"),
      format = str(n, "format", "json").toLowerCase,
      options = obj(n, "options"))

  private def parseSink(n: JsonNode): SinkSpec =
    SinkSpec(
      input = str(n, "input"),
      name = str(n, "name"),
      paths = strArr(n, "paths"),
      format = str(n, "format", "json").toLowerCase,
      saveMode = str(n, "saveMode", "overwrite").toLowerCase,
      partitionBy = strArr(n, "partitionBy"),
      layout = str(n, "layout", "none").toLowerCase,
      layoutKeys = strArr(n, "layoutKeys"),
      layoutPartitions = n.path("layoutPartitions").asInt(0),
      mergeKey = str(n, "mergeKey", ""),
      statsCols = strArr(n, "statsCols"),
      bloomCols = strArr(n, "bloomCols"),
      hllCols = strArr(n, "hllCols"),
      aggGroupBy = strArr(n, "aggGroupBy"),
      aggSums = strArr(n, "aggSums"),
      constraints = obj(n, "constraints"),
      guards = obj(n, "guards"),
      expects = strArr(n, "expects"),
      audit = strArr(n, "audit"),
      evolve = strArr(n, "evolve"),
      snapshotTag = str(n, "snapshotTag", ""))

  private def parseTransform(n: JsonNode): TransformSpec = {
    val name = str(n, "name")
    val p = n.get("params")
    require(p != null, s"transformation '$name' missing params")
    // `rrf` names its frames via ranked_inputs instead of input
    def input = str(p, "input")
    def output = str(p, "output", name)
    str(n, "type") match {
      case "normalize_fields" =>
        NormalizeSpec(name, input, output,
          fields = arr(p, "fields").map(f => FieldMapping(str(f, "name"), strArr(f, "sources"))),
          autoFlattenNaming = str(p, "auto_flatten_naming", "snake_case"))
      case "drop_columns" =>
        DropColumnsSpec(name, input, output, strArr(p, "columns"))
      case "select_columns" =>
        SelectColumnsSpec(name, input, output, strArr(p, "columns"))
      case "add_fields" =>
        AddFieldsSpec(name, input, output,
          arr(p, "fields").map(f => AddedField(str(f, "name"),
            optStr(f, "function"), optStr(f, "literal"))))
      case "validate_fields" =>
        ValidateSpec(name, input,
          okOutput = str(p, "ok_output", s"${name}_ok"),
          koOutput = str(p, "ko_output", s"${name}_ko"),
          rules = arr(p, "validations").map(r =>
            ValidationRule(str(r, "field"), strArr(r, "validations"))))
      case "filter" =>
        FilterSpec(name, input, output, str(p, "condition"))
      case "join" =>
        JoinSpec(name, input,
          rightInput = str(p, "right_input"),
          output = output,
          on = strArr(p, "on"),
          how = str(p, "how", "inner").toLowerCase,
          broadcastSide = optStr(p, "broadcast"),
          leftSketch = optStr(p, "left_sketch"),
          rightSketch = optStr(p, "right_sketch"))
      case "aggregate" =>
        AggregateSpec(name, input, output,
          groupBy = strArr(p, "group_by"),
          aggs = arr(p, "aggs").map(a => NamedExpr(str(a, "name"), str(a, "expr"))))
      case "sql" =>
        SqlSpec(name, input, output, str(p, "query"))
      case "dedup" =>
        DedupTransformSpec(name, input, output,
          method = str(p, "method", "exact"),
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          mode = str(p, "mode", "filter"),
          threshold = p.path("threshold").asDouble(0.8),
          scoreCol = optStr(p, "score"),
          statsPath = optStr(p, "stats_path"),
          clusterStrategy = str(p, "cluster_strategy", "one_wave").toLowerCase)
      case "chunk" =>
        ChunkSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          size = p.path("size").asInt(512),
          overlap = p.path("overlap").asInt(64))
      case "rrf" =>
        val ranked = strArr(p, "ranked_inputs")
        require(ranked.size >= 2, s"rrf '$name': want >=2 ranked_inputs")
        RrfSpec(name, ranked.head, output,
          rankedInputs = ranked,
          fuseK = p.path("fuse_k").asInt(60),
          topK = p.path("top_k").asInt(10))
      case "scd2" =>
        Scd2Spec(name, input, output,
          keyCol = str(p, "key"), tsCol = str(p, "ts"),
          attrCol = str(p, "attr"), tieCol = str(p, "tie"))
      case "pagerank" =>
        PageRankSpec(name, input, output,
          srcCol = str(p, "src", "src"), dstCol = str(p, "dst", "dst"),
          iterations = p.path("iterations").asInt(5),
          convergeL1 = p.path("converge_l1").asLong(-1L))
      case "expect" =>
        ExpectSpec(name, input, output,
          checks = strArr(p, "checks"),
          failOnViolation = p.path("fail_on_violation").asBoolean(false))
      case "decontaminate" =>
        DecontaminateSpec(name, input,
          benchInput = str(p, "bench_input"),
          output = output,
          contentCol = str(p, "content", "text"),
          benchContentCol = str(p, "bench_content", "text"))
      case "text_analysis" =>
        TextAnalysisSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          analyses = if (p.has("analyses")) strArr(p, "analyses") else Seq("quality"),
          blocklistTerms = strArr(p, "blocklist_terms"))
      case "stratified_sample" =>
        StratifiedSampleSpec(name, input, output,
          strataCol = str(p, "strata"),
          idCol = str(p, "id", "doc_id"),
          fractions = obj(p, "fractions").map { case (k, v) => k -> v.toDouble },
          defaultFraction = p.path("default_fraction").asDouble(1.0))
      case "pack" =>
        PackSpec(name, input, output,
          tokensCol = str(p, "tokens"),
          idCol = str(p, "id", "doc_id"),
          budget = p.path("budget").asInt(2048),
          shards = p.path("shards").asInt(8))
      case "split" =>
        SplitSpec(name, input, output,
          idCol = str(p, "id", "doc_id"),
          trainPct = p.path("train_pct").asInt(80),
          valPct = p.path("val_pct").asInt(10))
      case "ann" =>
        AnnSpec(name, input, output,
          method = str(p, "method", "lsh").toLowerCase,
          idCol = str(p, "id", "vec_id"),
          vecCol = str(p, "vec", "embedding"),
          k = p.path("k").asInt(10),
          tables = p.path("tables").asInt(8),
          bits = p.path("bits").asInt(8),
          nlist = p.path("nlist").asInt(0),
          nprobe = p.path("nprobe").asInt(0),
          codebookPath = optStr(p, "codebook_path"),
          pqPath = optStr(p, "pq_path"),
          threshold = p.path("threshold").asDouble(0.95),
          queriesInput = optStr(p, "queries_input"),
          where = optStr(p, "where"))
      case "classify" =>
        ClassifySpec(name, input, output,
          contentCol = str(p, "content", "text"),
          buckets = p.path("buckets").asInt(4096),
          bias = p.path("bias").asLong(0L),
          threshold = p.path("threshold").asLong(0L),
          weightsPath = optStr(p, "weights_path"))
      case "version_delta" =>
        VersionDeltaSpec(name, input,
          newInput = str(p, "new_input"),
          output = output,
          idCol = str(p, "id", "doc_id"),
          contentCol = str(p, "content", "text"))
      case "shard" =>
        ShardSpec(name, input, output,
          idCol = str(p, "id", "doc_id"),
          seed = str(p, "seed", "graft"),
          docsPerShard = p.path("docs_per_shard").asInt(1024))
      case "funnel" =>
        FunnelSpec(name, input, output,
          steps = strArr(p, "steps"),
          userCol = str(p, "user", "user_id"),
          ordCol = str(p, "ord", "event_id"),
          typeCol = str(p, "type_col", "event_type"))
      case "cohort" =>
        CohortSpec(name, input, output,
          cohortType = str(p, "cohort_type"),
          userCol = str(p, "user", "user_id"),
          tsCol = str(p, "ts", "ts"),
          typeCol = str(p, "type_col", "event_type"))
      case "fuzzy" =>
        FuzzySpec(name, input, output,
          keyCol = str(p, "key"),
          idCol = str(p, "id", "doc_id"),
          blockPrefix = p.path("block_prefix").asInt(8),
          maxDist = p.path("max_dist").asInt(1),
          method = str(p, "method", "levenshtein").toLowerCase,
          minSim = p.path("min_sim").asDouble(0.9))
      case "familiarity" =>
        FamiliaritySpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          minDf = p.path("min_df").asInt(3))
      case "dup_ngram_coverage" =>
        DupNgramCoverageSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          n = p.path("n").asInt(5),
          minDocs = p.path("min_docs").asInt(2))
      case "mix" =>
        MixSpec(name, input, output,
          strataCol = str(p, "strata"),
          idCol = str(p, "id", "doc_id"))
      case "search" =>
        SearchSpec(name, input, output,
          terms = strArr(p, "terms"),
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          k = p.path("k").asInt(20))
      case "centroids" =>
        CentroidsSpec(name, input, output,
          labelCol = str(p, "label", "label"),
          vecCol = str(p, "vec", "embedding"))
      case "key_histogram" =>
        KeyHistogramSpec(name, input, output,
          keyCol = str(p, "key"),
          topN = p.path("top_n").asInt(20),
          method = str(p, "method", "exact").toLowerCase)
      case "top_spans" =>
        TopSpansSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          window = p.path("window").asInt(8),
          k = p.path("k").asInt(20))
      case "quantize" =>
        QuantizeSpec(name, input, output,
          vecCol = str(p, "vec", "embedding"),
          idCol = str(p, "id", "vec_id"))
      case "cap" =>
        CapSpec(name, input, output,
          groupCol = str(p, "group"),
          idCol = str(p, "id", "doc_id"),
          maxN = p.path("max_n").asInt(1000))
      case "quantile_gate" =>
        QuantileGateSpec(name, input, output,
          groupCol = str(p, "group"),
          metricCol = str(p, "metric"),
          q = p.path("q").asDouble(0.5))
      case "upsample" =>
        UpsampleSpec(name, input, output,
          weightExpr = str(p, "weight_expr"))
      case "order" =>
        GlobalOrderSpec(name, input, output,
          idCol = str(p, "id", "doc_id"),
          seed = str(p, "seed", "graft"))
      case "boilerplate" =>
        BoilerplateSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          sourceCol = str(p, "source", "source"),
          minDf = p.path("min_df").asInt(10))
      case "paragraph_dedup" =>
        ParagraphDedupSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"))
      case "c4_clean" =>
        C4CleanSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          minWords = p.path("min_words").asInt(3))
      case "sentences" =>
        SentencesSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"))
      case "normalize_text" =>
        NormalizeTextSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          stripPunct = p.path("strip_punct").asBoolean(false))
      case "take" =>
        TakeSpec(name, input, output,
          n = p.path("n").asLong(1000L),
          idCol = str(p, "id", "doc_id"),
          seed = str(p, "seed", "graft"))
      case "weighted_sample" =>
        WeightedSampleSpec(name, input, output,
          n = p.path("n").asLong(1000L),
          weightCol = str(p, "weight"),
          idCol = str(p, "id", "doc_id"),
          seed = str(p, "seed", "graft"),
          groupCol = str(p, "group", ""))
      case "lm_score" =>
        LmScoreSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          referenceInput = str(p, "reference_input", ""),
          minCount = p.path("min_count").asLong(2L),
          alpha = p.path("alpha").asDouble(0.5))
      case "substring_dedup" =>
        SubstringDedupSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          idCol = str(p, "id", "doc_id"),
          window = p.path("window").asInt(50))
      case "bpe_tokenize" =>
        BpeTokenizeSpec(name, input, output,
          contentCol = str(p, "content", "text"),
          numMerges = p.path("num_merges").asInt(200),
          mergesPath = str(p, "merges_path", ""))
      case "compute_stats" =>
        ComputeStatsSpec(name, input,
          fields = if (p.has("fields")) Some(strArr(p, "fields")) else None,
          includeValidationStats = p.path("include_validation_stats").asBoolean(false),
          okInput = optStr(p, "ok_input"),
          koInput = optStr(p, "ko_input"),
          outputPath = optStr(p, "output_path"),
          distinctMode = str(p, "distinct_mode", "auto").toLowerCase)
      case other =>
        throw new IllegalArgumentException(s"Unsupported transformation type: '$other' (in '$name')")
    }
  }

  // -- JsonNode helpers ------------------------------------------------

  private def str(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && v.isTextual, s"expected string field '$field' in $n")
    v.asText
  }

  private def str(n: JsonNode, field: String, default: String): String =
    optStr(n, field).getOrElse(default)

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText)

  private def arr(n: JsonNode, field: String): Seq[JsonNode] = {
    val v = n.get(field)
    if (v == null || v.isNull) Nil else v.elements().asScala.toSeq
  }

  private def strArr(n: JsonNode, field: String): Seq[String] =
    arr(n, field).map(_.asText)

  private def obj(n: JsonNode, field: String): Map[String, String] = {
    val v = n.get(field)
    if (v == null || v.isNull) Map.empty
    else v.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }
}
