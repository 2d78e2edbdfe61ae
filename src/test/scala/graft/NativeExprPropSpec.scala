package graft

import graft.functions.{TextHashExprs, VectorExprs}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks of the native kernels, evaluated DIRECTLY
 * (`Expression.eval`) — no Spark session, so ScalaCheck can drive
 * hundreds of cases per property.
 */
class NativeExprPropSpec extends AnyFunSuite {

  private val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "alpha", "beta", "gamma", "delta", "x1", "y2", "z3")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)))
      .map(_.mkString(" "))

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def shOf(doc: String): Option[Array[Long]] =
    Option(TextHashExprs.ShingleHashesExpr(Literal(doc), 3).eval(null))
      .map(_.asInstanceOf[ArrayData].toLongArray())

  private def modelShingles(doc: String, k: Int = 3): Set[String] = {
    val toks = doc.toLowerCase.trim match {
      case "" => Array.empty[String]; case t => t.split("\\s+")
    }
    if (toks.length < k) Set.empty
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  test("shingleHashes: sorted, distinct, one hash per distinct shingle") {
    check(Prop.forAll(docGen) { doc =>
      val model = modelShingles(doc)
      shOf(doc) match {
        case None => model.isEmpty
        case Some(hs) =>
          hs.toSeq == hs.toSeq.sorted && hs.distinct.length == hs.length &&
            hs.length == model.size
      }
    })
  }

  test("sortedIntersectCount == set-intersection cardinality") {
    val pair = for (a <- docGen; b <- docGen) yield (a, b)
    check(Prop.forAll(pair) { case (a, b) =>
      (shOf(a), shOf(b)) match {
        case (Some(ha), Some(hb)) =>
          val lit = (x: Array[Long]) =>
            Literal.create(x, ArrayType(LongType, containsNull = false))
          val n = VectorExprs.SortedLongIntersectCount(lit(ha), lit(hb))
            .eval(null).asInstanceOf[Int]
          n == ha.toSet.intersect(hb.toSet).size
        case _ => true
      }
    })
  }

  test("minhash signature is elementwise monotone under document extension") {
    val pair = for (a <- docGen if a.split("\\s+").length >= 3; b <- docGen) yield (a, b)
    check(Prop.forAll(pair) { case (a, b) =>
      def sig(d: String): Option[Array[Long]] =
        Option(TextHashExprs.MinhashSigExpr(Literal(d), 3, 16).eval(null))
          .map(_.asInstanceOf[ArrayData].toLongArray())
      (sig(a), sig(a + " " + b)) match {
        case (Some(s1), Some(s2)) => s1.zip(s2).forall { case (x, y) => y <= x }
        case _ => true
      }
    }, n = 100)
  }

  test("simhash is invariant under token permutation") {
    val pair = for (d <- docGen; seed <- Gen.chooseNum(0L, Long.MaxValue)) yield (d, seed)
    check(Prop.forAll(pair) { case (doc, seed) =>
      val toks = doc.trim match { case "" => Array.empty[String]; case t => t.split("\\s+") }
      val shuffled = new scala.util.Random(seed).shuffle(toks.toSeq).mkString(" ")
      def sim(d: String) = Option(TextHashExprs.SimhashExpr(Literal(d)).eval(null))
      sim(doc) == sim(shuffled)
    })
  }

  test("freqReorder is a permutation: rare prefix then frequent tail, orders kept") {
    val gen = for {
      doc <- docGen
      mask <- Gen.listOfN(32, Gen.oneOf(true, false))
    } yield (doc, mask)
    check(Prop.forAll(gen) { case (doc, mask) =>
      shOf(doc) match {
        case None => true
        case Some(hs) =>
          val freq = hs.zipWithIndex.collect { case (h, i) if mask(i % mask.length) => h }
            .sorted
          val out = TextHashExprs.FreqReorderExpr(
              Literal.create(hs, ArrayType(LongType, containsNull = false)), freq)
            .eval(null).asInstanceOf[ArrayData].toLongArray()
          val fset = freq.toSet
          out.toSeq == (hs.filterNot(fset) ++ hs.filter(fset)).toSeq &&
            out.sorted.toSeq == hs.sorted.toSeq
      }
    })
  }

  test("vecDot equals the left-to-right double fold") {
    val pair = for (n <- Gen.chooseNum(0, 16);
                    a <- Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0));
                    b <- Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0))) yield (a, b)
    check(Prop.forAll(pair) { case (a, b) =>
      val lit = (x: Seq[Double]) =>
        Literal.create(x.toArray, ArrayType(DoubleType, containsNull = false))
      val d = VectorExprs.VecDot(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val model = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      d == model
    })
  }

  test("AhoCorasick.distinctMatches == naive distinct-contains count") {
    val termGen = Gen.nonEmptyListOf(
      Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
      .map(_.map(_.trim).filter(_.nonEmpty).distinct.take(8))
      .suchThat(_.nonEmpty)
    val textGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    check(Prop.forAll(termGen, textGen) { (terms, text) =>
      val trie = graft.functions.AhoCorasick.Trie.build(terms.toArray)
      val naive = terms.count(text.contains(_))
      trie.distinctMatches(text) == naive
    })
  }
}
