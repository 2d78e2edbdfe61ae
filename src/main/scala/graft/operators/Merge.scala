package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/**
 * Keyed MERGE/UPSERT into a hive-partitioned dataset by COPY-ON-WRITE
 * partition rewrite — the write-side companion of [[Versioning.delta]]
 * (#105): `delta` computes which documents were added/updated/removed
 * between corpus snapshots; `mergeInto` APPLIES such a change set to a
 * partitioned parquet target by rewriting ONLY the partitions that
 * contain changed keys, leaving every other partition's files
 * untouched on disk. The incremental-refresh primitive the
 * append/overwrite saveMode (reference: main.py sink handling) cannot
 * express: without it, a 2% daily corpus refresh rewrites 100 TB.
 *
 * Scale shape:
 *  - resident-partition discovery reads TWO columns of the target
 *    (key + partition — column-pruned scan), never payloads;
 *  - the rewrite reads/writes only the affected partitions
 *    (partition-pruned scan: the `isin` filter on the partition
 *    column prunes directories, asserted in MergeSpec), so IO is
 *    bounded by changed-partition bytes, not table bytes;
 *  - the only driver-side materialization is the affected partition
 *    VALUE list — bounded by the table's partition count, the same
 *    cardinality every Hive metastore round-trips;
 *  - the staging write is a dynamic partitionBy (no shuffle: rows are
 *    written per-task into their partition directories).
 *
 * Consistency: each affected partition directory is swapped in via a
 * filesystem rename after the full staging write succeeds — readers
 * see old-or-new per partition, never a half-written directory. The
 * swap loop itself is NOT transactional across partitions (a crash
 * mid-loop leaves some partitions new, some old — rerunning the same
 * merge is idempotent and completes the swap); cross-partition
 * atomicity is table-format (Delta/Iceberg commit-log) territory, out
 * of scope for a plain-parquet engine.
 *
 * Storage: the swap rides [[LogStore.forPath]] — a bare path keeps
 * POSIX rename semantics, a scheme-qualified target (`hdfs://…`)
 * swaps through the Hadoop store (same O(1) directory rename on
 * HDFS), so the `saveMode: merge` sink runs on the same fabrics the
 * snapshot format does. Data IO was always storage-agnostic (Spark's
 * readers/writers); this closes the swap itself.
 */
object Merge {

  /** What a merge did: partition values rewritten (dirs swapped),
    * dropped (emptied by deletes), and the delta row counts. */
  final case class MergeStats(rewritten: Seq[String], dropped: Seq[String],
                              upsertRows: Long, deleteKeys: Long)

  /**
   * Apply (`upserts`, `deleteKeys`) to the dataset at `targetPath`.
   *
   * - `upserts`: full-schema rows to insert-or-replace by `key`
   *   (schema must match the target, including `partitionCol`; a key
   *   whose partition value changed is removed from its old partition
   *   and written to the new one — both partitions count as
   *   affected).
   * - `deleteKeys`: frame carrying a `key` column of keys to remove;
   *   extra columns are ignored. Keys absent from the target are
   *   no-ops. A key must not appear in both `upserts` and
   *   `deleteKeys` (checked — the outcome would be order-dependent).
   * - target partitioning is single-column hive layout
   *   (`partitionCol=value` directories), the layout
   *   `DataFrameWriter.partitionBy` produces. Null partition values
   *   are rejected (hive's default-partition escape is a trap, not a
   *   feature, for a keyed table).
   */
  def mergeInto(spark: SparkSession, targetPath: String,
                upserts: DataFrame, deleteKeys: DataFrame,
                key: String, partitionCol: String,
                format: String = "parquet"): MergeStats = {
    val target = spark.read.format(format).load(targetPath)
    require(target.columns.contains(partitionCol),
      s"target at $targetPath has no partition column '$partitionCol' " +
        s"(columns: ${target.columns.mkString(",")})")
    require(upserts.columns.sorted.sameElements(target.columns.sorted),
      s"upserts schema ${upserts.columns.sorted.mkString(",")} must match " +
        s"target ${target.columns.sorted.mkString(",")}")

    // one cached pass over each delta frame; they are read twice
    // (affected-partition discovery + the rewrite itself)
    val ups = OpCache.cache(upserts)
    val dels = OpCache.cache(deleteKeys.select(col(key)).distinct())
    val upsertRows = ups.count()
    val deleteRows = dels.count()
    val overlap = ups.select(col(key)).join(dels, key).limit(1).count()
    require(overlap == 0,
      s"merge: key(s) present in BOTH upserts and deleteKeys — remove the " +
        "ambiguity upstream (an upsert of a deleted key is order-dependent)")
    require(ups.filter(col(partitionCol).isNull).limit(1).count() == 0,
      s"merge: upserts carry NULL '$partitionCol' values")

    // affected partitions = partitions the incoming rows land in ∪
    // partitions where any changed key currently resides (two-column
    // scan of the target; covers moved keys' OLD partitions and every
    // delete's partition)
    val allKeys = OpCache.cache(
      ups.select(col(key)).unionByName(dels).distinct())
    val resident = target.select(col(key), col(partitionCol))
      .filter(col(partitionCol).isNotNull) // hive default-partition rows: unsupported, see docs
      .join(allKeys, Seq(key), "left_semi")
      .select(col(partitionCol).cast("string"))
    val incoming = ups.select(col(partitionCol).cast("string"))
    val affected = resident.unionByName(incoming).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // partition values become directory names in the swap; values that
    // hive would URL-escape ('=', '/', '%', ...) are rejected rather
    // than silently mismatching the escaped dir name
    affected.find(!_.matches("[A-Za-z0-9._-]+")).foreach(p =>
      throw new IllegalArgumentException(
        s"merge: partition value '$p' needs hive escaping — unsupported"))
    if (affected.isEmpty) return MergeStats(Nil, Nil, 0L, deleteRows)

    // copy-on-write: survivors of the affected partitions + upserts,
    // staged beside the target then swapped in per partition
    val survivors = target
      .filter(col(partitionCol).cast("string").isin(affected: _*))
      .join(allKeys, Seq(key), "left_anti")
    val merged = survivors.unionByName(ups.select(target.columns.map(col): _*))
    val store = LogStore.forPath(targetPath)
    val staging = s"$targetPath.__graft_merge_staging"
    store.deleteTree(staging)
    merged.write.mode("overwrite").format(format)
      .partitionBy(partitionCol).save(staging)

    val rewritten = Seq.newBuilder[String]
    val dropped = Seq.newBuilder[String]
    affected.foreach { p =>
      val dirName = s"$partitionCol=$p"
      val dst = s"$targetPath/$dirName"
      val src = s"$staging/$dirName"
      store.deleteTree(dst)
      if (store.exists(src)) {
        store.rename(src, dst)
        rewritten += p
      } else dropped += p // every row of the partition was deleted
    }
    store.deleteTree(staging)
    Seq(ups, dels, allKeys).foreach(OpCache.unpersistEager)
    MergeStats(rewritten.result(), dropped.result(), upsertRows, deleteRows)
  }
}
