package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding similarity: cosine near-dup pairs and approximate
 * nearest-neighbor top-k over an `array<float>` column.
 *
 * All kernels are pure Catalyst expression trees
 * (`zip_with` + `aggregate`) — codegen'd, no UDF serialization on
 * the hot path. Floats are widened to double BEFORE any arithmetic
 * (exact) so scores are stable across platforms.
 *
 * Scale design: the brute-force variants are the small-side /
 * correctness baseline; the scale path is random-hyperplane LSH
 * ([[lshTopK]], [[lshDupPairs]]): per-vector signatures in one
 * projection, then candidate generation as an equi-join on
 * (table, bucket) — a plain hash shuffle whose key cardinality we
 * control via bits-per-table, never an O(n²) cross join. This is the
 * standard SimHash-for-cosine construction (Charikar '02): P[bit
 * match] = 1 - angle/π, so vectors at cosine ≥ t collide in a b-bit
 * bucket with probability ≥ (1-arccos(t)/π)^b per table.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double arithmetic, left-to-right order. Native codegen
    * expression ([[graft.functions.VectorExprs.VecDot]]) — same
    * arithmetic as the `aggregate(zip_with(...))` HOF fold it
    * replaced, ~10× faster (no per-row intermediate array). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.vecDot(a, b)

  /** ‖a‖₂ in double arithmetic (native codegen expression). */
  def l2Norm(a: Column): Column = graft.functions.VectorExprs.vecNorm(a)

  /** Cosine similarity (0 where either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** (id, vec, norm) projection used by the pairwise kernels: norms
    * are computed once per vector, not once per pair. Parallelism is
    * guarded — a 1-partition corpus would otherwise serialize the
    * pairwise scoring onto one core. */
  private def withNorm(df: DataFrame, id: Column, vec: Column): DataFrame =
    Scale.ensureParallelism(
      df.select(id.as("id"), vec.as("vec"), l2Norm(vec).as("norm")))

  /**
   * Embedding near-dup pairs: (id_a, id_b, cos_sim) with
   * cos_sim ≥ threshold and id_a < id_b. Brute force O(n²) — the
   * correctness baseline; use [[lshDupPairs]] at scale.
   */
  def cosineDupPairs(df: DataFrame, id: Column, vec: Column,
                     threshold: Double = 0.95): DataFrame = {
    val v = withNorm(df, id, vec)
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.vec"), col("b.vec")) /
          when(col("a.norm") * col("b.norm") === 0.0, lit(Double.NaN))
            .otherwise(col("a.norm") * col("b.norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /**
   * Brute-force cosine top-k neighbors for every query vector:
   * (id, neighbor_id, cos_sim, rank), rank 1..k, ties broken by
   * neighbor id. The exact baseline ANN variants are measured
   * against. Cross-join + window — O(n·m), correct at any size but
   * only viable when one side is broadcastable.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     id: Column, vec: Column, k: Int = 10): DataFrame = {
    val q = withNorm(queries, id, vec)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, id, vec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("neighbor_id"),
        (dot(col("qvec"), col("vec")) /
          when(col("qnorm") * col("norm") === 0.0, lit(Double.NaN))
            .otherwise(col("qnorm") * col("norm"))).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumnRenamed("qid", "id")
  }

  /** (id, vec, norm, table, bucket) — one row per (vector, table).
    * All signatures come from ONE native-expression pass
    * ([[graft.functions.VectorExprs.LshSignatures]]): near-Gaussian
    * deterministic hyperplanes (sum of 4 hashed uniforms — sign-LSH
    * collision probability tracks 1 - θ/π, which uniform-cube
    * components visibly miss: measured recall dropped ~2× with plain
    * uniforms), planes cached per executor, no broadcast state. */
  private def bucketed(df: DataFrame, id: Column, vec: Column,
                       tables: Int, bits: Int, seed: Int): DataFrame = {
    val v = withNorm(df, id, vec)
    v.select(col("id"), col("vec"), col("norm"),
        posexplode(graft.functions.VectorExprs.lshSignatures(col("vec"), tables, bits, seed)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
  }

  /**
   * LSH-bucketed ANN top-k: candidates are corpus vectors sharing at
   * least one (table, bucket) with the query, scored exactly, then
   * ranked. Returns (id, neighbor_id, cos_sim, rank). Recall tunes
   * with `tables` (↑recall) and `bits` (↓bucket size / ↑speed).
   */
  def lshTopK(df: DataFrame, id: Column, vec: Column, k: Int = 10,
              tables: Int = 8, bits: Int = 8, seed: Int = 42): DataFrame = {
    val b = bucketed(df, id, vec, tables, bits, seed)
    val a = b.as("a")
    val c = b.as("c")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    // cos_sim is computed BEFORE the dedup so the distinct exchange
    // carries 3 scalars per row, not two 64-float vectors (VecDot is
    // cheap enough that re-scoring multi-table collisions beats
    // shuffling payloads)
    a.join(c, col("a.table") === col("c.table") &&
        col("a.bucket") === col("c.bucket") && col("a.id") =!= col("c.id"))
      .select(col("a.id").as("id"), col("c.id").as("neighbor_id"),
        (dot(col("a.vec"), col("c.vec")) /
          when(col("a.norm") * col("c.norm") === 0.0, lit(Double.NaN))
            .otherwise(col("a.norm") * col("c.norm"))).as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Deterministic driver-side Lloyd's k-means over a bounded sample —
   * the IVF coarse quantizer. The sample is small by construction
   * (trainSize vectors × dim doubles); training an IVF codebook on a
   * sample is the standard construction (the codebook quality barely
   * moves past ~100×nlist samples). Init picks evenly-spaced sample
   * points after sorting by id → same centroids on every run.
   */
  def trainKmeans(df: DataFrame, id: Column, vec: Column, nlist: Int,
                  trainSize: Int = 10000, iters: Int = 10): Array[Array[Double]] = {
    val sample = df.select(id.cast("long").as("id"), vec.cast("array<double>").as("v"))
      .orderBy(col("id")).limit(trainSize)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val k = math.min(nlist, sample.length)
    val dim = sample(0).length
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0; var j = 0
          while (j < dim) { val d = v(j) - centroids(c)(j); d2 += d * d; j += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else { val m = new Array[Double](dim); var j = 0
          while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }; m }
      }
      it += 1
    }
    centroids
  }

  /**
   * IVF-Flat ANN top-k: corpus vectors are assigned to their nearest
   * centroid cell (one projection); each query probes its `nprobe`
   * nearest cells; candidates = cell equi-join (a plain hash shuffle
   * keyed by cell id — at scale, cells are the partition unit and the
   * codebook is the only coordinated state). Exact cosine rescoring +
   * top-k window, same contract as [[lshTopK]]/[[bruteForceTopK]].
   */
  def ivfTopK(df: DataFrame, id: Column, vec: Column, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4,
              centroidsIn: Option[Array[Array[Double]]] = None): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    val centroids = centroidsIn.getOrElse(trainKmeans(df, id, vec, nlist))
    val v = withNorm(df, id, vec)
    val data = v.select(col("id"), col("vec"), col("norm"),
      element_at(nearestCentroids(col("vec"), centroids, 1), 1).as("cell"))
    val queries = v.select(col("id").as("qid"), col("vec").as("qvec"), col("norm").as("qnorm"),
        explode(nearestCentroids(col("vec"), centroids, nprobe)).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    queries.join(data, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("id"), col("id").as("neighbor_id"),
        (dot(col("qvec"), col("vec")) /
          when(col("qnorm") * col("norm") === 0.0, lit(Double.NaN))
            .otherwise(col("qnorm") * col("norm"))).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * LSH near-dup pairs (scale path for [[cosineDupPairs]]):
   * same-bucket candidates, exact rescoring, threshold filter.
   */
  def lshDupPairs(df: DataFrame, id: Column, vec: Column,
                  threshold: Double = 0.95, tables: Int = 8, bits: Int = 8,
                  seed: Int = 42): DataFrame = {
    val b = bucketed(df, id, vec, tables, bits, seed)
    val a = b.as("a")
    val c = b.as("c")
    a.join(c, col("a.table") === col("c.table") &&
        col("a.bucket") === col("c.bucket") && col("a.id") < col("c.id"))
      .select(col("a.id").as("id_a"), col("c.id").as("id_b"),
        (dot(col("a.vec"), col("c.vec")) /
          when(col("a.norm") * col("c.norm") === 0.0, lit(Double.NaN))
            .otherwise(col("a.norm") * col("c.norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }
}
