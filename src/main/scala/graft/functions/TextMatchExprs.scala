package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-pattern substring matching via AHO-CORASICK — the scan-side
 * blocklist kernel. Web-corpus pipelines screen every document
 * against term lists that reach tens of thousands of entries
 * (unsafe-content lexicons, spam phrases, boilerplate markers); N
 * separate `contains`/regex probes cost O(N·L) per document, which
 * at 100 TB × 10k terms is the difference between one pass and a
 * thousand. The automaton matches ALL terms in one O(L) walk
 * (Aho & Corasick, CACM'75).
 *
 * The automaton is built once per (terms) set per JVM and cached —
 * the same executor-local lazy-artifact pattern as the LSH plane
 * cache. Matching is substring semantics (phrases with spaces work;
 * "stream" matches inside "streaming"), identical to DuckDB's
 * `contains`, so the oracle replicates the count with
 * `list_filter(terms, t -> contains(text, t))` exactly.
 */
object AhoCorasick {

  final class Trie private (
      children: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int],
      outputs: Array[Array[Int]],
      val nTerms: Int) {

    /** Number of DISTINCT terms occurring in `text` as substrings. */
    def distinctMatches(text: String): Int = {
      val seen = new Array[Boolean](nTerms)
      var found = 0
      var node = 0
      var i = 0
      val n = text.length
      while (i < n && found < nTerms) {
        val c = Character.valueOf(text.charAt(i))
        var s = node
        var next = children(s).get(c)
        while (next == null && s != 0) {
          s = fail(s)
          next = children(s).get(c)
        }
        node = if (next == null) 0 else next.intValue()
        val out = outputs(node)
        var j = 0
        while (j < out.length) {
          if (!seen(out(j))) { seen(out(j)) = true; found += 1 }
          j += 1
        }
        i += 1
      }
      found
    }
  }

  object Trie {
    def build(terms: Array[String]): Trie = {
      require(terms.nonEmpty && terms.forall(_.nonEmpty),
        "terms must be non-empty strings")
      val children = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
      // goto graph
      terms.zipWithIndex.foreach { case (t, id) =>
        var node = 0
        t.foreach { ch =>
          val c = Character.valueOf(ch)
          var next = children(node).get(c)
          if (next == null) {
            children += new java.util.HashMap[Character, Integer]()
            ends += Nil
            next = Integer.valueOf(children.length - 1)
            children(node).put(c, next)
          }
          node = next.intValue()
        }
        ends(node) = id :: ends(node)
      }
      // BFS fail links + merged output sets
      val n = children.length
      val fail = new Array[Int](n)
      val out: Array[List[Int]] = Array.tabulate(n)(i => ends(i))
      val queue = scala.collection.mutable.Queue[Int]()
      children(0).forEach((_, v) => queue.enqueue(v.intValue()))
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).forEach { (c, v) =>
          queue.enqueue(v.intValue())
          var f = fail(u)
          var nxt = children(f).get(c)
          while (nxt == null && f != 0) {
            f = fail(f)
            nxt = children(f).get(c)
          }
          val fv = if (nxt == null || nxt.intValue() == v.intValue()) 0 else nxt.intValue()
          fail(v.intValue()) = fv
          out(v.intValue()) = out(v.intValue()) ++ out(fv)
        }
      }
      new Trie(children.toArray, fail, out.map(_.distinct.toArray), terms.length)
    }
  }

  // bounded per-JVM automaton cache: long-lived executors run many
  // queries with different term lists; an unbounded map would leak
  // large tries (10k-term automata are MBs each). Access-ordered
  // LinkedHashMap = small LRU; synchronized because eviction mutates.
  private val MaxCachedTries = 32
  private val cache =
    new java.util.LinkedHashMap[Seq[String], Trie](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], Trie]): Boolean =
        size() > MaxCachedTries
    }

  def trieFor(terms: Seq[String]): Trie = cache.synchronized {
    val hit = cache.get(terms)
    if (hit != null) hit
    else { val t = Trie.build(terms.toArray); cache.put(terms, t); t }
  }

  /** n of distinct `terms` present in the string child (LongType). */
  case class MultiMatchCount(child: Expression, terms: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(terms.nonEmpty, "terms must be non-empty")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected string, got ${child.dataType}")
    }
    // per-task memo: one LRU lookup per task, not per row — the
    // expression instance is deserialized per task, so this costs one
    // reference per task and removes the shared-cache lock from rows
    @transient private lazy val trie = AhoCorasick.trieFor(terms)
    override def nullSafeEval(v: Any): Any =
      trie.distinctMatches(v.asInstanceOf[UTF8String].toString).toLong
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def multiMatchCount(c: Column, terms: Seq[String]): Column =
    GraftBridge.column(MultiMatchCount(GraftBridge.expression(c), terms))
}
