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
}
