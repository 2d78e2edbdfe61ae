package graft.operators

import graft.TextAnalysisCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines.
 *
 * Scale design: nothing here is O(n²) over the corpus. Every near-dup
 * variant reduces to (1) a per-document signature computed in one
 * codegen'd projection, then (2) a shuffle keyed on a bucket that
 * provably contains all qualifying pairs (shared shingle / LSH band /
 * SimHash chunk — pigeonhole), then (3) pair verification bounded to
 * same-bucket candidates. At 100 TB the shuffle key cardinality is
 * what matters; all bucket keys here are well-distributed hashes.
 */
object Dedup {

  /**
   * Exact dedup: group by content, keep the minimum id as the
   * canonical representative. Output: (fp, doc_id, n_copies).
   * At scale: group on md5(content) instead of raw content to keep
   * shuffle rows narrow — done here (the fp IS the group key).
   */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame =
    df.select(md5(content).as("fp"), id.as("__id"))
      .groupBy("fp")
      .agg(min(col("__id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /**
   * Word k-shingles of the content, distinct per doc: (id, shingle).
   * Distinctness comes from the native [[graft.functions.TextHashExprs
   * .ShinglesExpr]] (per-document set), so no global `.distinct()`
   * shuffle is needed — one projection + explode.
   */
  def shingles(df: DataFrame, content: Column, id: Column, k: Int = 3): DataFrame =
    Scale.ensureParallelism(
      df.select(id.as("doc_id"),
        explode(graft.functions.TextHashExprs.shingles(content, k)).as("shingle")))

  /**
   * n-gram Jaccard near-dup pairs via a PREFIX-FILTERED set-similarity
   * join (PPJoin-style; see Xiao et al., WWW'08): each document keeps
   * a sorted array of shingle hashes; only its first
   * `|s| - ⌈t·|s|⌉ + 1` hashes (its prefix under the global hash
   * order) generate join candidates — any pair with Jaccard ≥ t must
   * share a prefix element, so there are no false negatives, while
   * candidates shrink dramatically vs the join-on-every-shingle
   * formulation. Survivors are rescored exactly with an O(n+m)
   * sorted-merge intersection. Returns (doc_a, doc_b, inter, size_a,
   * size_b, jaccard) with jaccard ≥ threshold and doc_a < doc_b.
   *
   * At scale: candidate generation is a hash shuffle on prefix-hash
   * (bounded fan-out per doc), rescoring touches only candidate
   * pairs, and the doc payload carried through the join is one
   * long-array per side.
   *
   * Candidate pruning (both join-side, zero extra passes):
   *  - length filter: Jaccard ≥ t forces t·|a| ≤ |b| ≤ |a|/t —
   *    any pair violating the mutual size bound is dropped in the
   *    join condition before it materializes;
   *  - positional filter: a pair whose FIRST shared prefix element
   *    sits at 0-based positions (i, j) can overlap in at most
   *    min(|a|−i, |b|−j) elements, and Jaccard ≥ t needs overlap
   *    ≥ ⌈t/(1+t)·(|a|+|b|)⌉; occurrences that cannot reach that
   *    bound are dropped (the first-match occurrence of every true
   *    pair always survives, so no false negatives).
   */
  def ngramJaccard(df: DataFrame, content: Column, id: Column,
                   k: Int = 3, threshold: Double = 0.8): DataFrame = {
    import graft.functions.{TextHashExprs, VectorExprs}
    // cached: the signature frame is referenced four times (both
    // prefix sides + both rescoring joins); without the cache an
    // expensive upstream (e.g. pipeline_docs' scored/filtered
    // subtree) is recomputed per reference. The cache is narrow —
    // one (id, hash-array) row per doc. Long-lived sessions looping
    // many queries should clear it between queries
    // (spark.catalog.clearCache(), as graft.Verify/Bench do).
    val sigs = Scale.ensureParallelism(
      df.select(id.as("doc_id"),
          TextHashExprs.shingleHashes(content, k).as("sh"))
        .filter(col("sh").isNotNull)).cache()
    val prefixLen = (size(col("sh")) - ceil(lit(threshold) * size(col("sh"))) + 1).cast("int")
    val prefixes = sigs.select(col("doc_id"), size(col("sh")).as("sz"),
        posexplode(slice(col("sh"), lit(1), prefixLen)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "ph")
    val minOverlap = ceil(lit(threshold / (1.0 + threshold)) *
      (col("a.sz") + col("b.sz")))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.ph") === col("b.ph") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz") &&
          least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) >= minOverlap)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        VectorExprs.sortedIntersectCount(col("sh_a"), col("sh_b")).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /**
   * MinHash signatures in ONE projection (no explode, no shuffle):
   * `numHashes` permutations approximated by salted xxhash64 over
   * shingles, min-tracked inside the native
   * [[graft.functions.TextHashExprs.MinhashSigExpr]].
   * Output: (doc_id, sig: array<bigint>); docs with < k tokens are
   * dropped (they have no shingles).
   */
  def minhashSignatures(df: DataFrame, content: Column, id: Column,
                        k: Int = 3, numHashes: Int = 16): DataFrame =
    Scale.ensureParallelism(
      df.select(id.as("doc_id"),
          graft.functions.TextHashExprs.minhashSig(content, k, numHashes).as("sig"))
        .filter(col("sig").isNotNull))

  /**
   * MinHash + LSH near-dup: band the signature (`bands` bands of
   * rows = numHashes/bands), bucket-join on (band index, band hash),
   * then estimate Jaccard as the fraction of matching signature
   * positions. Pairs with estimate ≥ threshold, doc_a < doc_b.
   * The band join is the scale path: candidate generation is a plain
   * shuffle on band-hash, never a cross join.
   */
  def minhashLsh(df: DataFrame, content: Column, id: Column,
                 k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, content, id, k, numHashes).cache()
    val banded = sig.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    candidates
      .withColumn("est_jaccard",
        graft.functions.VectorExprs.longVecEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /**
   * MinHash + LSH with EXACT verification: candidates from the band
   * join, rescored against the true shingle sets (sorted-merge
   * intersection, same kernel as [[ngramJaccard]]), so the output is
   * true-Jaccard pairs, not estimates. With a wide band layout
   * (default 32 hashes × 16 bands of 2 rows) the per-pair candidate
   * miss probability at j ≥ t is (1−j²)^bands ≈ 8·10⁻⁸ at j = 0.8 —
   * the standard LSH-then-verify construction where false positives
   * cost only rescoring and false negatives are driven to negligible.
   * Same output contract as [[ngramJaccard]]: (doc_a, doc_b, inter,
   * size_a, size_b, jaccard), jaccard ≥ threshold, doc_a < doc_b.
   */
  def minhashLshVerified(df: DataFrame, content: Column, id: Column,
                         k: Int = 3, numHashes: Int = 32, bands: Int = 16,
                         threshold: Double = 0.8): DataFrame = {
    import graft.functions.{TextHashExprs, VectorExprs}
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = Scale.ensureParallelism(
      df.select(id.as("doc_id"),
          TextHashExprs.minhashSig(content, k, numHashes).as("sig"),
          TextHashExprs.shingleHashes(content, k).as("sh"))
        .filter(col("sig").isNotNull)).cache()
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        VectorExprs.sortedIntersectCount(col("sh_a"), col("sh_b")).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /**
   * 64-bit SimHash per document (sign-sum of token xxhash64 bits),
   * computed in one projection by the native
   * [[graft.functions.TextHashExprs.SimhashExpr]] — no explode, no
   * shuffle. Output: (doc_id, simhash); token-less docs are dropped.
   */
  def simhashSignatures(df: DataFrame, content: Column, id: Column): DataFrame =
    Scale.ensureParallelism(
      df.select(id.as("doc_id"),
          graft.functions.TextHashExprs.simhash64(content).as("simhash"))
        .filter(col("simhash").isNotNull))

  /**
   * SimHash near-dup: pairs with Hamming distance ≤ maxDistance.
   * Pigeonhole blocking: split 64 bits into `maxDistance + 1` chunks;
   * any pair within distance shares at least one exact chunk, so
   * candidates come from equi-joins on (chunk index, chunk value) —
   * again a shuffle, not a cross join.
   */
  def simhash(df: DataFrame, content: Column, id: Column,
              maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val bitsPerChunk = 64 / chunks
    val sig = simhashSignatures(df, content, id).cache()
    val chunked = sig.select(col("doc_id"), col("simhash"),
        posexplode(transform(sequence(lit(0), lit(chunks - 1)),
          i => call_function("shiftright", col("simhash"), i * bitsPerChunk)
            .bitwiseAND((1L << bitsPerChunk) - 1))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
