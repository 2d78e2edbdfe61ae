package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Scale levers that are policy, not physics: utilities a 100 TB
 * deployment reaches for when the default shuffle plan isn't enough.
 *
 * - AQE (`spark.sql.adaptive.*`) already handles moderate skew and
 *   post-shuffle coalescing; [[saltedEquiJoin]] is for the pathological
 *   case — a handful of keys holding a double-digit percentage of the
 *   fact table, where even a split skew-join leaves one straggler.
 * - [[writeBucketed]]/bucketed reads remove the shuffle from repeated
 *   large-large joins entirely: both sides pre-hashed into the same
 *   bucket layout join with zero Exchange (verified in ScaleSpec by
 *   asserting the physical plan has no shuffle).
 */
object Scale {

  val SaltCol = "__graft_salt"

  /**
   * Guard against under-partitioned inputs: a few small parquet files
   * arrive as 1-2 partitions, which serializes every downstream
   * map-side operator (explode fan-outs, signature kernels, cross
   * joins) onto one core. Repartitions ONLY when the estimated scan
   * partition count (leaf bytes / `files.maxPartitionBytes`) is below
   * the session's default parallelism — on a real multi-TB input this
   * is a no-op, so no gratuitous full shuffle of big data.
   *
   * The estimate is PLAN-TIME ONLY (optimized-plan leaf statistics) —
   * no `df.rdd`, which would force physical planning + RDD
   * materialization of the subtree once per call-site. Catalyst can
   * overestimate derived plans, but overestimation only skips the
   * repartition (results unchanged); the frames passed here are
   * projections of scans, where leaf stats are the actual file sizes.
   */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanPartitions(df) < target) df.repartition(target) else df
  }

  /** Plan-time scan-partition estimate: leaf bytes over the session's
    * `files.maxPartitionBytes` (typed conf accessor — the raw string
    * may carry a size suffix), CAPPED at the file count when every
    * file of a non-columnar relation has a non-splittable compression
    * extension — a single 2 GB .json.gz arrives as ONE partition no
    * matter what the byte math says. */
  private def estimatedScanPartitions(df: DataFrame): BigInt = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val maxPartBytes =
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val byBytes = estimatedLeafBytes(df) / maxPartBytes + 1
    val nonSplittable = Seq(".gz", ".zip", ".deflate", ".zst", ".lz4", ".br")
    val caps = df.queryExecution.analyzed.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation
            if !fs.fileFormat.toString.toLowerCase.contains("parquet") &&
              !fs.fileFormat.toString.toLowerCase.contains("orc") =>
          val files = fs.location.inputFiles
          if (files.nonEmpty &&
              files.forall(f => nonSplittable.exists(f.toLowerCase.endsWith)))
            Some(BigInt(files.length))
          else None
        case _ => None
      }
      case _ => None
    }.flatten
    caps.foldLeft(byBytes)(_ min _)
  }

  /** Sum of leaf-relation size estimates — actual file / in-memory
    * bytes, immune to the join-multiplication blowup of derived-plan
    * stats. Uses the ANALYZED plan (not optimized): leaf relations are
    * identical, no optimizer pass is paid, and — unlike
    * `optimizedPlan` — it doesn't run the batch-support check, so it
    * is safe on streaming frames too. Never runs a job. */
  def estimatedLeafBytes(df: DataFrame): BigInt =
    df.queryExecution.analyzed.collectLeaves().map(_.stats.sizeInBytes).sum

  /**
   * Plan-time row-count estimate — NEVER an action. Preference order:
   *  1. Catalyst `rowCount` (present for ANALYZEd tables);
   *  2. parquet footer row counts of the leaf file relations —
   *     driver-side metadata IO only (footers are a few KB each),
   *     sampled at up to `sampleFiles` files per relation and
   *     extrapolated by byte size;
   *  3. leaf bytes / schema default row width (order-of-magnitude
   *     fallback for non-parquet leaves).
   * Parameter-sizing callers (e.g. IVF's √n list count) only need the
   * order of magnitude, so estimate error is acceptable where a
   * `count()` action — a full scan at 100 TB — is not.
   */
  /** `sampleFiles` footers are read and extrapolated by bytes; a
    * directory with AT MOST that many files therefore gets the EXACT
    * row count (all footers read, extrapolation factor exactly 1.0) —
    * the property `sim_lsh_auto`'s oracle relies on to re-derive
    * `autoBits` from COUNT(*). The default covers every test-scale
    * dir incl. the materialized sf1; footer reads are ~ms each, so
    * even the 64-footer worst case is plan-time noise. */
  def estimatedRows(df: DataFrame, sampleFiles: Int = 64): Double = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = df.queryExecution.analyzed
    plan.stats.rowCount.map(_.toDouble).getOrElse {
      val fromFooters = plan.collectLeaves().collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation if fs.fileFormat.toString.toLowerCase.contains("parquet") =>
            parquetRowEstimate(df, fs, sampleFiles)
          case _ => None
        }
        case _ => None
      }
      val footerRows = fromFooters.flatten.sum
      if (fromFooters.nonEmpty && fromFooters.forall(_.isDefined)) footerRows
      else {
        val width = math.max(8, df.schema.map(_.dataType.defaultSize).sum)
        math.max(1.0, (BigDecimal(estimatedLeafBytes(df)) / width).toDouble)
      }
    }
  }

  /** Footer-based row estimate for one file relation: read up to
    * `sampleFiles` footers, extrapolate rows/byte to the full size. */
  private def parquetRowEstimate(df: DataFrame,
                                 fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
                                 sampleFiles: Int): Option[Double] =
    try {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val paths = fs.location.inputFiles.take(sampleFiles)
      if (paths.isEmpty) return Some(0.0)
      var rows = 0L
      var bytes = 0L
      paths.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          rows += reader.getRecordCount
          bytes += in.getLength
        } finally reader.close()
      }
      val totalBytes = fs.location.sizeInBytes
      Some(
        if (bytes <= 0) rows.toDouble
        else rows.toDouble * (totalBytes.toDouble / bytes))
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Skew-safe equi-join: the fact side gets a deterministic salt in
   * [0, salts) (hash of the whole row — reproducible, no RNG state),
   * the dim side is replicated once per salt, and the join key becomes
   * (key, salt) — a hot key's rows now spread over `salts` reducers.
   * Output equals the plain inner equi-join on `key`, in exchange for
   * `salts`× replication of the (small but not broadcastable) side.
   */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int): DataFrame = {
    require(salts >= 1)
    val saltedFact = fact.withColumn(SaltCol,
      pmod(hash(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val saltedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, SaltCol)).drop(SaltCol)
  }

  /**
   * Write a bucketed + sorted parquet table: `numBuckets` by `keys`,
   * registered in the session catalog. Two tables bucketed the same
   * way join with NO exchange and NO sort — the co-located join
   * pattern for fact-fact joins that repeat every pipeline run.
   */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Content FINGERPRINT of source paths (files or directories): md5
    * over every regular file's (relative path, size, mtime), 16 hex
    * chars. Derive layout-table names from this tag instead of
    * `path.hashCode`: regenerating the source changes the tag, so a
    * stale bucketed table is simply never addressed again (and its
    * location reclaimed lazily by [[ensureBucketed]]), and two
    * distinct source dirs cannot alias one table the way a 32-bit
    * String.hashCode can. Metadata-only walk — no data reads. */
  def sourceTag(paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    paths.sorted.foreach { p =>
      val store = LogStore.forPath(p)
      md.update(p.getBytes("UTF-8"))
      if (store.exists(p)) {
        val files =
          if (store.isDirectory(p)) store.walkFiles(p).map(r => (r, s"$p/$r"))
          else Seq(("", p))
        files
          .map { case (rel, f) =>
            s"$rel:${store.size(f)}:${store.modifiedTime(f)}" }
          .sorted
          .foreach(s => md.update(s.getBytes("UTF-8")))
      }
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** [[writeBucketed]] only if `table` isn't in the session catalog
    * yet — the write-once/reuse-everywhere contract for layout
    * tables. Reclaims an ORPHANED warehouse location first: the
    * in-memory catalog forgets tables when the JVM exits but the
    * warehouse directory persists, and a managed-table CREATE in a
    * fresh session then fails with LOCATION_ALREADY_EXISTS. `df` is
    * by-name so the source scan is only planned when a write actually
    * happens.
    *
    * The check-reclaim-write sequence is guarded by an ATOMIC lock
    * file beside the location (the store's `createNew` either claims
    * or refuses): a concurrent caller cannot delete a location another
    * claim is mid-write on; it waits for the lock, re-checks the
    * catalog, and proceeds only if the table is still absent there.
    * Reclaims are logged (location + file count). Name tables with
    * [[sourceTag]] so a regenerated source gets a FRESH name rather
    * than silently serving stale bucketed rows. Cross-JVM note: two
    * JVMs have independent in-memory catalogs, so the lock serializes
    * their writes but the second JVM still rebuilds — safe, not
    * shared; a shared metastore is the cluster answer. */
  def ensureBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
                     keys: Seq[String], numBuckets: Int)
                    (df: => DataFrame): Unit = {
    if (spark.catalog.tableExists(table)) return
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    val store = LogStore.forPath(wh)
    store.mkdirs(wh)
    val loc = s"$wh/$table"
    val lock = s"$wh/$table._graft_lock"
    val deadlineNs = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var claimed = false
    while (!claimed) {
      if (store.createNew(lock)) claimed = true
      else {
        // another claim is writing this table; wait for it rather
        // than deleting files out from under its readers
        if (spark.catalog.tableExists(table)) return
        if (System.nanoTime() > deadlineNs) throw new IllegalStateException(
          s"ensureBucketed: lock $lock held > 120s — stale lock from a " +
            "crashed run? remove it manually if no writer is alive")
        Thread.sleep(100)
      }
    }
    try {
      if (spark.catalog.tableExists(table)) return // raced, other claim won
      if (store.exists(loc)) {
        org.apache.logging.log4j.LogManager.getLogger(getClass)
          .warn(s"ensureBucketed: reclaiming orphaned location $loc " +
            s"(${store.walkFiles(loc).size} files, no catalog entry)")
        store.deleteTree(loc)
      }
      writeBucketed(df, table, keys, numBuckets)
    } finally { store.delete(lock); () }
  }

  /**
   * COMPACT a dataset into ~`targetBytes` output files — the
   * small-files remedy (a 100 TB lake accumulating thousands of
   * kilobyte files per ingest hour pays footer/task overhead on every
   * read until compacted). File count = leaf-byte estimate over
   * `targetBytes` (plan-time; no count job). Returns the file count.
   *
   * Uses coalesce (no shuffle) when shrinking the partition count —
   * compaction is IO-bound and the rows are already where they need
   * to be; repartition would shuffle the whole dataset once for
   * nothing. If the input has FEWER partitions than the target (rare
   * for a small-files problem) coalesce keeps them as-is.
   */
  def compact(df: DataFrame, outPath: String,
              targetBytes: Long = 512L << 20,
              format: String = "parquet"): Int = {
    require(targetBytes > 0)
    val n = ((estimatedLeafBytes(df) / targetBytes) + 1).toInt
    df.coalesce(n).write.mode(SaveMode.Overwrite).format(format).save(outPath)
    n
  }

  /**
   * RANGE-LAYOUT write: repartitionByRange + sortWithinPartitions on
   * `keys`, so every output file covers a DISJOINT key range and its
   * parquet column min/max footer stats actually prune — a point or
   * range predicate on the layout key reads one file instead of all
   * of them. The single-dimension, no-table-format ancestor of
   * Z-ordering; the right layout for append-then-scan-by-time/id
   * datasets. (Asserted in ScaleSpec by reading back per-file min/max
   * ranges and checking pairwise disjointness.)
   */
  def writeRangeLayout(df: DataFrame, outPath: String, keys: Seq[String],
                       partitions: Int,
                       format: String = "parquet",
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty && partitions >= 1)
    df.repartitionByRange(partitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(mode).format(format).save(outPath)
  }

  /**
   * Z-ORDER (Morton-curve) layout key over several numeric columns:
   * each column is quantile-bucketed into 2^bitsPerKey ranks and the
   * rank bits are interleaved, so rows close on the curve are close
   * in EVERY key — clustering a file layout by the z-key gives
   * multi-dimensional data skipping where [[writeRangeLayout]] only
   * prunes its first key (predicates on the second key of a
   * lexicographic sort hit every file).
   *
   * The quantile boundaries come from ONE `approx_percentile`
   * aggregation over all keys (a bounded driver collect of
   * keys × 2^bits doubles — a corpus statistic computable once and
   * reusable across writes, like every codebook here); bucketing +
   * bit interleaving is then a pure scan-side Column tree. Nulls rank
   * into bucket 0.
   */
  def zOrderKey(df: DataFrame, keys: Seq[String], bitsPerKey: Int = 8): Column = {
    require(keys.nonEmpty && bitsPerKey >= 1 && bitsPerKey * keys.length <= 63,
      "need 1+ keys and bitsPerKey * nKeys <= 63")
    val nb = 1 << bitsPerKey
    val ps = (1 until nb).map(_.toDouble / nb)
    val bounds: Seq[Array[Double]] = {
      val aggs = keys.map(k => percentile_approx(col(k).cast("double"),
        typedLit(ps), lit(10000)).as(k))
      val row = df.agg(aggs.head, aggs.tail: _*).first()
      keys.indices.map(i => row.getSeq[Double](i).toArray)
    }
    val buckets = keys.zip(bounds).map { case (k, bs) =>
      // rank = number of boundaries <= value (0 .. nb-1); null → 0
      size(filter(typedLit(bs.toSeq), b => b <= col(k).cast("double")))
    }
    val k = keys.length
    val terms = for {
      i <- 0 until bitsPerKey
      j <- 0 until k
    } yield shiftleft(
      shiftright(buckets(j).cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /**
   * Z-ORDERED write: range-partition + sort on the interleaved
   * [[zOrderKey]], so per-file parquet min/max stats are narrow on
   * ALL layout keys at once — the OPTIMIZE ZORDER BY of table
   * formats, expressed with nothing but repartitionByRange.
   * (ScaleSpec quantifies it: mean per-file span fraction of BOTH
   * keys well under the single-key layout's second-key span.)
   */
  def writeZOrder(df: DataFrame, outPath: String, keys: Seq[String],
                  partitions: Int, bitsPerKey: Int = 8,
                  format: String = "parquet",
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitions >= 1)
    df.withColumn("__z", zOrderKey(df, keys, bitsPerKey))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).format(format).save(outPath)
  }
}
