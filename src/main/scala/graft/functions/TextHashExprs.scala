package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native expressions for the shingle/MinHash/SimHash kernels.
 *
 * The composable versions (explode → distinct → groupBy-min/sum)
 * computed per-document signatures through TWO shuffles plus a
 * per-shingle HOF tree. These expressions produce the signature in the
 * scan projection itself — zero shuffles for signature computation, so
 * the only shuffle left in near-dup detection is the one that matters
 * at 100 TB: the bucket join. Hashing uses Spark's own XXH64 (same
 * function as `xxhash64()`, seed 42), so SimHash signatures are
 * bit-identical to the groupBy formulation they replace.
 *
 * Tokenization matches the DuckDB oracles exactly: tokens are the
 * Java-regex `\s+` split of the trimmed lowercased text; shingles are
 * k consecutive tokens joined by a single space, de-duplicated per
 * document.
 */
object TextHashExprs {

  private val Seed = 42L

  /** xxhash64-compatible hash of a string (== Spark's xxhash64()). */
  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private def tokensOf(text: UTF8String): Array[String] = {
    val t = text.toLowerCase.toString.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  private def shinglesOf(text: UTF8String, k: Int): java.util.LinkedHashSet[String] = {
    val toks = tokensOf(text)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length >= k) {
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    }
    out
  }

  /** xxhash64 of every k-gram INSTANCE in positional order — NON-
    * distinct, one hash per position (the multiplicity-preserving
    * sibling of [[ShingleHashesExpr]], for instance-level coverage
    * metrics). Empty array when the text has fewer than k tokens.
    * One fused tokenize+hash pass per row; the composable
    * `transform(sequence, …concat_ws(slice))` HOF tree this replaces
    * is interpreted per element and built every n-gram as a Catalyst
    * string — measured ~10× slower at sf0.1. */
  case class NgramHashInstancesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val toks = tokensOf(v.asInstanceOf[UTF8String])
      if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = hashUtf8(UTF8String.fromString(sb.toString), Seed)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct values of a long array with their multiplicities, as
    * `array<struct<h: long, cnt: long>>` sorted ascending by value —
    * the scan-side half of per-(doc, n-gram) instance counting. Doing
    * this in the projection replaces a whole `groupBy(doc_id, hash)`
    * exchange of raw instances with a map-side sort+run-length pass,
    * so the first thing that ever shuffles is the already-distinct
    * (doc, hash, cnt) triple. Null in → null out; empty in → empty. */
  case class LongCountsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("h", LongType, nullable = false),
        StructField("cnt", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val in = v.asInstanceOf[ArrayData].toLongArray()
      if (in.isEmpty) return new GenericArrayData(Array.empty[Any])
      val sorted = in.clone()
      java.util.Arrays.sort(sorted)
      val out = new scala.collection.mutable.ArrayBuffer[Any](16)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j) == sorted(i)) j += 1
        out += org.apache.spark.sql.catalyst.InternalRow(sorted(i), (j - i).toLong)
        i = j
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** XXH64 of every k-gram instance over RAW (case-preserving)
    * tokens — the compact window id for exact-substring dedup's
    * 100 TB path (8 bytes/window vs md5's 32-char hex; same
    * tokenizer as [[NgramMd5InstancesExpr]], no lowercasing). */
  case class NgramRawHashInstancesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val t = v.asInstanceOf[UTF8String].toString.trim
      val toks: Array[String] = if (t.isEmpty) Array.empty else t.split("\\s+")
      if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = hashUtf8(UTF8String.fromString(sb.toString), Seed)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * md5 hex of every k-gram INSTANCE in positional order — the
   * window-identity kernel for exact-substring dedup, where the
   * DuckDB oracle must derive the IDENTICAL id from the same window
   * (`md5(string_agg(tok, ' '))`): 128-bit md5 of the space-joined
   * RAW tokens (no lowercasing — substring dedup must preserve the
   * original text it rebuilds). One fused tokenize+hash pass per row.
   */
  case class NgramMd5InstancesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val t = v.asInstanceOf[UTF8String].toString.trim
      val toks: Array[String] = if (t.isEmpty) Array.empty else t.split("\\s+")
      if (toks.length < k) return new GenericArrayData(Array.empty[Any])
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Any](toks.length - k + 1)
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        md.reset()
        val digest = md.digest(sb.toString.getBytes("UTF-8"))
        val hex = new java.lang.StringBuilder(32)
        var b = 0
        while (b < digest.length) {
          hex.append(Character.forDigit((digest(b) >> 4) & 0xf, 16))
          hex.append(Character.forDigit(digest(b) & 0xf, 16))
          b += 1
        }
        out(i) = UTF8String.fromString(hex.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct k-shingles of the lowercased text, in first-seen order. */
  case class ShinglesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val set = shinglesOf(v.asInstanceOf[UTF8String], k)
      val arr = new Array[Any](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Sorted array of distinct shingle xxh64 hashes — the input to
   * prefix-filtered similarity joins: ascending hash value is the
   * global total order the prefix-filter theorem needs, and sorted
   * arrays let intersection counts run as an O(n+m) merge.
   * Null when the document has fewer than k tokens.
   */
  case class ShingleHashesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val set = shinglesOf(v.asInstanceOf[UTF8String], k)
      if (set.isEmpty) return null
      val hs = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) {
        hs(i) = hashUtf8(UTF8String.fromString(it.next()), Seed)
        i += 1
      }
      java.util.Arrays.sort(hs)
      // drop (astronomically unlikely) duplicate hashes so counts
      // stay set-semantics
      var n = 0
      var j = 0
      while (j < hs.length) {
        if (j == 0 || hs(j) != hs(j - 1)) { hs(n) = hs(j); n += 1 }
        j += 1
      }
      ArrayData.toArrayData(if (n == hs.length) hs else java.util.Arrays.copyOf(hs, n))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * MinHash signature: per salt i, min over shingles of
   * xxh64(xxh64(shingle), salt=i). Null when the document has fewer
   * than k tokens (mirrors "no shingles → no signature row" in the
   * explode formulation). Duplicate shingles cannot affect a min, so
   * no per-document dedup is needed.
   */
  case class MinhashSigExpr(child: Expression, k: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val toks = tokensOf(v.asInstanceOf[UTF8String])
      if (toks.length < k) return null
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i <= toks.length - k) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        val base = hashUtf8(UTF8String.fromString(sb.toString), Seed)
        var h = 0
        while (h < numHashes) {
          val hv = XXH64.hashLong(base, h.toLong)
          if (hv < mins(h)) mins(h) = hv
          h += 1
        }
        i += 1
      }
      ArrayData.toArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * MinHash signature AND the sorted distinct shingle-hash array in
   * ONE pass over the text: struct(sig: array<long>, sh: array<long>).
   * The LSH-then-verify construction needs both per document (bands
   * from `sig`, exact rescoring from `sh`); computing them as two
   * expressions tokenizes and base-hashes every shingle twice. This
   * kernel shares one tokenize+hash pass, and applies the `numHashes`
   * salted hashes per DISTINCT shingle (repetitive documents don't
   * redo the salt loop per repeated occurrence). Output is
   * bit-identical to ([[MinhashSigExpr]], [[ShingleHashesExpr]]).
   * Null when the document has fewer than k tokens.
   */
  case class MinhashWithShinglesExpr(child: Expression, k: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val set = shinglesOf(v.asInstanceOf[UTF8String], k)
      if (set.isEmpty) return null
      val hs = new Array[Long](set.size)
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) {
        val base = hashUtf8(UTF8String.fromString(it.next()), Seed)
        hs(i) = base
        var h = 0
        while (h < numHashes) {
          val hv = XXH64.hashLong(base, h.toLong)
          if (hv < mins(h)) mins(h) = hv
          h += 1
        }
        i += 1
      }
      java.util.Arrays.sort(hs)
      var n = 0
      var j = 0
      while (j < hs.length) {
        if (j == 0 || hs(j) != hs(j - 1)) { hs(n) = hs(j); n += 1 }
        j += 1
      }
      val sh = if (n == hs.length) hs else java.util.Arrays.copyOf(hs, n)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](ArrayData.toArrayData(mins), ArrayData.toArrayData(sh)))
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Reorders a shingle-hash array into the PPJoin GLOBAL FREQUENCY
   * order (isFrequent, hash): hashes absent from `freqSorted` first
   * (ascending hash), then the frequent ones (ascending hash). Any
   * consistent total order preserves the prefix-filter theorem's
   * no-false-negative property; THIS order pushes high-document-
   * frequency shingles (stopword n-grams) to the array tail, so the
   * sliced prefix — the first |s|−⌈t·|s|⌉+1 elements — holds the
   * RAREST shingles. Without it, a shingle present in f documents
   * lands in ~(1−t) of all prefixes, creating ~((1−t)·f)²/2 candidate
   * pairs on a single join key: a quadratic, skewed shuffle at scale.
   * Membership test is a binary search over the sorted frequent set.
   */
  case class FreqReorderExpr(child: Expression, freqSorted: Array[Long])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    // never stringify the frequent set into plan descriptions — a
    // megabyte argString per node makes every explain/AQE plan dump
    // allocate (then truncate) huge strings
    override def stringArgs: Iterator[Any] =
      Iterator(child, s"freqSet[${freqSorted.length}]")
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Long](n)
      val freq = new Array[Long](n)
      var rare = 0
      var nf = 0
      var i = 0
      while (i < n) {
        val h = a.getLong(i)
        if (java.util.Arrays.binarySearch(freqSorted, h) >= 0) { freq(nf) = h; nf += 1 }
        else { out(rare) = h; rare += 1 }
        i += 1
      }
      System.arraycopy(freq, 0, out, rare, nf)
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * 64-bit SimHash over whitespace tokens of the lowercased text
   * (every occurrence votes, matching the explode formulation
   * bit-for-bit — same xxhash64 per token, same ±1 votes, same
   * `votes > 0` bit rule). Null when the document has no tokens.
   */
  case class SimhashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val toks = tokensOf(v.asInstanceOf[UTF8String])
      if (toks.isEmpty) return null
      val votes = new Array[Long](64)
      var i = 0
      while (i < toks.length) {
        val h = hashUtf8(UTF8String.fromString(toks(i)), Seed)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
        i += 1
      }
      var sim = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
      sim
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // -- Column API ------------------------------------------------------

  private def e(c: Column) = GraftBridge.expression(c)

  def shingles(text: Column, k: Int): Column =
    GraftBridge.column(ShinglesExpr(e(text), k))
  def shingleHashes(text: Column, k: Int): Column =
    GraftBridge.column(ShingleHashesExpr(e(text), k))
  def ngramHashInstances(text: Column, k: Int): Column =
    GraftBridge.column(NgramHashInstancesExpr(e(text), k))
  def ngramMd5Instances(text: Column, k: Int): Column =
    GraftBridge.column(NgramMd5InstancesExpr(e(text), k))
  def ngramRawHashInstances(text: Column, k: Int): Column =
    GraftBridge.column(NgramRawHashInstancesExpr(e(text), k))
  def longCounts(hashes: Column): Column =
    GraftBridge.column(LongCountsExpr(e(hashes)))
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinhashSigExpr(e(text), k, numHashes))
  def minhashWithShingles(text: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinhashWithShinglesExpr(e(text), k, numHashes))
  def freqReorder(sh: Column, freqSorted: Array[Long]): Column =
    GraftBridge.column(FreqReorderExpr(e(sh), freqSorted))
  def simhash64(text: Column): Column =
    GraftBridge.column(SimhashExpr(e(text)))
}
