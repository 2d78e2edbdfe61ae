package graft.operators

import graft.TextAnalysisCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus search / retrieval over the text surface — the lookup side
 * of a training-data pipeline (sourcing eval-adjacent documents,
 * targeted corpus probes, relevance-ranked sampling).
 *
 * Scale design: term statistics (document frequency, corpus size,
 * average length) are aggregates over the per-document term-frequency
 * frame — tiny relative to the corpus — and are broadcast back; the
 * corpus itself is scanned ONCE (term counting is a scan-side
 * projection over the token array, no explode shuffle), and the
 * final top-k is a TakeOrdered, not a global sort.
 */
object Search {

  /**
   * BM25 ranking of documents against a bag of query `terms`
   * (Robertson/Spärck Jones weighting, k1/b defaults per Lucene).
   *
   * Determinism notes (the operator is oracle-gated cross-engine):
   *  - idf is the RATIONAL form (N − df + 0.5)/(df + 0.5) with no
   *    logarithm: libm `log` is not guaranteed identically rounded
   *    across engines, while +,−,×,÷ are IEEE-exact everywhere — the
   *    same discipline as the decimal-cast money aggregates. The
   *    per-term ranking is monotone in the standard log(1+idf) form.
   *  - per-document score = left fold of per-term contributions in
   *    term order (Spark `aggregate` over the term-sorted array;
   *    DuckDB `list_dot_product` of the term-ordered list with ones),
   *    because double addition is not associative.
   *
   * Output: (doc_id, score, rank), rank 1..topK by (score desc,
   * doc_id asc).
   */
  def bm25(df: DataFrame, content: Column, id: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.map(_.toLowerCase).distinct.size == terms.size,
      "query terms must be distinct (lowercased)")
    val termsArr = array(terms.map(t => lit(t.toLowerCase)): _*)
    // ONE corpus scan: per doc, token count + tf of each query term
    // (termArray is a handful of literals; the token array is
    // materialized once per row by CSE)
    val toks = TextAnalysisCols.wsTokens(lower(content))
    val perDoc = OpCache.cache(df.select(
      id.as("doc_id"),
      size(toks).as("dl"),
      filter(
        transform(termsArr, t =>
          struct(t.as("term"),
            size(filter(toks, x => x === t)).as("tf"))),
        s => s.getField("tf") > 0).as("tfs")))
    val hits = perDoc.filter(size(col("tfs")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("tfs")).as("h"))
      .select(col("doc_id"), col("dl"),
        col("h.term").as("term"), col("h.tf").cast("double").as("tf"))
    // corpus stats: N and avgdl come from the FULL cached frame (docs
    // with no hits still count toward N / avgdl), df per term from the
    // hits — all from the ONE corpus scan perDoc materialized
    val corpus = perDoc
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).cast("double").as("sum_dl"))
    val dfs = hits.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val contrib = hits
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"),
        // EXACT parenthesization mirrored in the oracle SQL
        (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / (col("sum_dl") / col("n_docs")))))))
          .as("c"))
    val scored = contrib.groupBy("doc_id")
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
  }

  /**
   * HYBRID RETRIEVAL fusion by RECIPROCAL RANK (RRF, Cormack/Clarke/
   * Büttcher SIGIR '09): given N ranked lists `(doc_id, rank)` — e.g.
   * [[bm25]]'s lexical top-k and an ANN cosine top-k — score every
   * document `Σ_lists 1/(fuseK + rank)`, a list that missed the doc
   * contributing 0, and return the fused top-k. Rank fusion needs NO
   * score calibration between modalities (BM25 magnitudes and cosines
   * never meet — only their ranks do), which is why it is the default
   * first fusion everywhere hybrid search ships.
   *
   * Determinism: contributions are integer-rational doubles
   * (`1.0/(fuseK + rank)` — IEEE division of exact integers) summed in
   * DECLARED list order, so the operator carries a full cross-engine
   * oracle even though the upstream scores are float kernels (only
   * their ranks flow in). Scale: inputs are top-k lists (k rows each),
   * so the fusion is driver-trivial however large the corpus the
   * lists were ranked over; the cost lives in the upstream rankers.
   *
   * Output: (doc_id, rank_<name>... , rrf, rank), rank 1..topK by
   * (rrf desc, doc_id asc).
   */
  def rrfFuse(ranked: Seq[(String, DataFrame)], fuseK: Int = 60,
              topK: Int = 10): DataFrame = {
    require(ranked.size >= 2, "rrfFuse wants at least two ranked lists")
    require(ranked.map(_._1).distinct.size == ranked.size,
      "rrfFuse: list names must be distinct")
    val sides = ranked.map { case (n, df) =>
      df.select(col("doc_id"), col("rank").as(s"rank_$n")) }
    val joined = sides.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val rrf = ranked.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(fuseK).cast("double") + col(s"rank_$n")),
        lit(0.0)) }.reduce(_ + _) // fixed fold order: declared list order
    val scored = joined.withColumn("rrf", rrf)
    scored.orderBy(col("rrf").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)))
  }
}
