package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus VERSION DELTA — classify every document across two corpus
 * snapshots as `added` / `removed` / `updated` / `unchanged` by id +
 * content hash. Training corpora are refreshed, not rebuilt: a new
 * crawl lands, some pages changed, most didn't. The delta is what
 * downstream incremental operators consume (re-embed only `added`+
 * `updated`, retire `removed` from the index, leave the 95%
 * `unchanged` untouched) — without it every refresh reprocesses the
 * full 100 TB.
 *
 * Implementation: documents travel as (id, md5(content)) — a 32-byte
 * key instead of the document body — through ONE full outer join on
 * id. At scale that join is a well-distributed hash shuffle on a
 * unique key (no skew by construction); both inputs prune to two
 * columns at the scan. Status is a pure projection on match/hash
 * equality.
 */
object Versioning {

  /**
   * Delta between `old` and `neu` snapshots: returns (doc_id, status,
   * old_hash, new_hash) for every id in either snapshot, with status
   * ∈ added | removed | updated | unchanged. Ids must be unique
   * within each snapshot (corpus invariant; enforce upstream with
   * [[Dedup.exact]]).
   */
  def delta(old: DataFrame, neu: DataFrame,
            oldId: Column, oldContent: Column,
            newId: Column, newContent: Column): DataFrame = {
    val o = old.select(oldId.as("doc_id"), md5(oldContent).as("old_hash"))
    val n = neu.select(newId.as("doc_id"), md5(newContent).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("updated")))
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
  }
}
