package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Context-window document chunking: split each document into
 * fixed-size overlapping character windows — the preprocessing step
 * for embedding models and context-bounded training. One projection +
 * explode: chunk boundaries are arithmetic on the length, so the
 * operator is scan-side with a fan-out of ⌈(len−overlap)/step⌉ rows
 * per doc and no shuffle at all.
 */
object Chunking {

  /**
   * (doc_id, chunk_id, chunk_text): chunk i covers characters
   * [i·step, i·step + size), step = size − overlap; every document
   * yields at least one chunk (short docs come back whole).
   */
  def chunk(df: DataFrame, content: Column, id: Column,
            size: Int = 512, overlap: Int = 64): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val step = size - overlap
    val nChunks = greatest(
      ceil((length(content) - lit(overlap)).cast("double") / step).cast("long"),
      lit(1L))
    df.select(id.as("doc_id"), content.as("__text"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        col("__text").substr((col("chunk_id") * step + 1).cast("int"),
          lit(size)).as("chunk_text"))
  }

  /**
   * Corpus vocabulary by DOCUMENT frequency: one row per distinct
   * lowercased whitespace token appearing in ≥ `minDf` documents.
   * Per-doc distinctness is computed map-side (`array_distinct` on
   * the token array), so the shuffle carries each (doc, token) once.
   */
  def vocabDf(df: DataFrame, content: Column, minDf: Int = 2): DataFrame =
    df.select(explode(array_distinct(
        graft.TextAnalysisCols.wsTokens(lower(content)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)

  /**
   * LEXICAL FAMILIARITY: per-document mean token document-frequency
   * and out-of-vocabulary rate against the corpus' own vocabulary
   * (OOV = token appearing in < `minDf` docs) — the cheap lexical
   * prior used alongside quality scores when filtering pretraining
   * data (garbled or hyper-niche documents score low mean_df / high
   * oov_frac). Token INSTANCES are weighted, so a doc repeating a
   * common word stays familiar. Output:
   * (doc_id, n_tokens, mean_df, oov_frac); empty docs → (0, 0.0, 0.0).
   *
   * Scale: two hash shuffles (distinct doc-token, then groupBy token)
   * build the df table — bounded by vocabulary cardinality — and the
   * instance join is an equi-join on the token key with map-side
   * partial aggregation after it. Same skeleton as [[vocabDf]]; no
   * driver-side state.
   */
  def lexicalFamiliarity(df: DataFrame, content: Column, id: Column,
                         minDf: Int = 3): DataFrame = {
    val toks = graft.TextAnalysisCols.wsTokens(lower(content))
    val base = Scale.ensureParallelism(df).select(id.as("doc_id"), toks.as("toks"))
    val inst = base.select(col("doc_id"), explode(col("toks")).as("token"))
    val dfreq = inst.distinct()
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val agg = inst.join(dfreq, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("doc_freq")).as("sum_df"),
        sum(when(col("doc_freq") < minDf, 1L).otherwise(0L)).as("n_oov"))
    // id-only projection (column-pruned scan) — re-deriving doc ids
    // from `base` would tokenize the corpus a second time
    df.select(id.as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("sum_df").cast("double") / col("n_tokens")).as("mean_df"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
  }

  /**
   * SENTENCE-BOUNDARY CHUNKING: split each document into sentences at
   * ". " / "! " / "? " boundaries — the granularity sentence-level
   * dedup and alignment pipelines operate on (char windows are
   * [[chunk]]; lines are [[stripBoilerplate]]'s unit). Implemented by
   * a sentinel rewrite (`$1\u0001` after each boundary) + split, which
   * keeps the terminal punctuation attached AND stays inside the
   * Java∩RE2 regex subset — a lookbehind split would not (RE2 has no
   * lookbehind, so no DuckDB oracle could verify it).
   *
   * Scale: one scan-side projection + explode; no shuffle at all.
   * Output: (doc_id, sent_id, sentence) with 0-based in-doc position.
   */
  def sentences(df: DataFrame, content: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
        posexplode(split(
          regexp_replace(content, "([.!?]) ", "$1\u0001"), "\u0001")))
      .withColumnRenamed("pos", "sent_id")
      .withColumnRenamed("col", "sentence")

  /**
   * Position-ordered per-doc rebuild shared by the line/paragraph
   * cleaners: aggregation columns producing `text_clean` (parts where
   * `__keep`, joined by `sep` in `p` order — byte-deterministic
   * regardless of partitioning), `n_kept` and `n_dropped`. Expects
   * the grouped frame to carry (`p`, `part`, `__keep`).
   */
  private[operators] def rebuildByPosition(part: String, sep: String): Seq[Column] = Seq(
    array_join(transform(
      array_sort(collect_list(when(col("__keep"), struct(col("p"), col(part))))),
      s => s.getField(part)), sep).as("text_clean"),
    sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
    sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"))

  /**
   * C4-STYLE LINE FILTERING: the classic C4 cleaning pass — keep only
   * lines that end in terminal punctuation (./!/?/") and have at
   * least `minWords` words, drop lines mentioning javascript/cookie
   * notices, and drop WHOLE documents containing "lorem ipsum" or a
   * curly brace (code). Documents with zero surviving lines are
   * dropped. Output: (doc_id, text_clean, n_kept, n_dropped).
   *
   * Scale: entirely scan-side per-line predicates (one codegen'd
   * filter over the exploded lines) plus the one per-doc rebuild
   * shuffle keyed by id — there is no corpus-wide state at all, so
   * the pass is embarrassingly parallel at any scale.
   */
  def c4Clean(df: DataFrame, content: Column, id: Column,
              minWords: Int = 3): DataFrame = {
    val docOk = !lower(content).contains("lorem ipsum") && !content.contains("{")
    val lines = df.filter(docOk)
      .select(id.as("doc_id"), posexplode(split(content, "\n")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "line")
    val t = trim(col("line"))
    val endsPunct = t.endsWith(".") || t.endsWith("!") ||
      t.endsWith("?") || t.endsWith("\"")
    // the repo's canonical tokenizer (trim + \s+ split, empty-safe)
    val enoughWords = graft.TextAnalysisCols.wsTokenCount(col("line")) >= minWords
    val noJunk = !lower(col("line")).contains("javascript") &&
      !lower(col("line")).contains("cookie")
    val aggs = rebuildByPosition("line", "\n")
    lines
      .withColumn("__keep", endsPunct && enoughWords && noJunk)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_kept") > 0)
  }

  /**
   * PER-SOURCE BOILERPLATE REMOVAL: drop every line that repeats in
   * ≥ `minDf` documents OF THE SAME SOURCE (navigation bars, cookie
   * banners, subscribe footers — the dominant noise in web-crawled
   * training corpora; CCNet/RefinedWeb do exactly this line-df
   * filtering). Scoped per source because a line that is boilerplate
   * on one site can be content on another.
   *
   * Scale: two bounded shuffles — line document-frequency keyed by
   * (source, line-hash), and the per-doc rebuild keyed by id. The
   * frequent-line frame (df ≥ minDf only) is broadcast into the
   * tagging join; its size is (frequent lines/source × sources), so
   * with millions of domains pass `hintBroadcast = false` and let
   * Spark choose (the tagging join then shuffles on the narrow
   * (source, hash) key instead). Lines travel as md5 hashes, never
   * as text keys. Rebuild order is positional (sort_array of
   * (pos, line) structs), so output text is byte-deterministic.
   *
   * Output: (doc_id, source, text_clean, n_kept, n_dropped) — docs
   * whose every line is boilerplate survive with text_clean = "".
   */
  def stripBoilerplate(df: DataFrame, content: Column, id: Column,
                       source: Column, minDf: Int = 10,
                       sep: String = "\n",
                       hintBroadcast: Boolean = true): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every line")
    val lines = df.select(id.as("doc_id"), source.as("__src"),
        posexplode(split(content, java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "line")
    val frequent = lines
      .groupBy(col("__src").as("__fsrc"), md5(col("line")).as("__lh"))
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select("__fsrc", "__lh")
    lines.join(if (hintBroadcast) broadcast(frequent) else frequent,
        col("__src") === col("__fsrc") && md5(col("line")) === col("__lh"),
        "left")
      .select(col("doc_id"), col("__src"), col("p"), col("line"),
        col("__lh").isNull.as("__keep"))
      .groupBy("doc_id")
      // source is constant per doc, so first() is deterministic —
      // carrying it lets per-source downstream stages chain join-free
      .agg(first(col("__src")).as("source"),
        rebuildByPosition("line", sep): _*)
  }
}
