package graft

import graft.functions.{TextHashExprs, VectorExprs}
import org.apache.spark.sql.functions._

/** Edge cases for the native Catalyst expressions, including parity
  * between codegen and interpreted paths. */
class NativeExprSpec extends SparkSpecBase {
  import spark.implicits._

  test("vecDot/vecNorm: empty arrays, zero vectors, null array") {
    val df = Seq(
      (1L, Some(Array.empty[Float]), Some(Array.empty[Float])),
      (2L, Some(Array(3.0f, 4.0f)), Some(Array(1.0f, 0.0f))),
      (3L, None, Some(Array(1.0f, 1.0f)))).toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorExprs.vecDot(col("a"), col("b")).as("d"),
        VectorExprs.vecNorm(col("a")).as("n"))
      .orderBy("id")
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(out(0) === ((1L, Some(0.0), Some(0.0))))
    assert(out(1) === ((2L, Some(3.0), Some(5.0))))
    assert(out(2) === ((3L, None, None)))
  }

  test("vecDot handles double arrays and mismatched lengths") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    // min-length semantics: 1*10 + 2*20
    assert(df.select(VectorExprs.vecDot(col("a"), col("b"))).as[Double].head === 50.0)
  }

  test("vecDot interpreted eval == codegen result") {
    val df = Seq((Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f))).toDF("a", "b")
    val viaPlan = df.select(VectorExprs.vecDot(col("a"), col("b"))).as[Double].head
    val manual = 0.1f.toDouble * 0.4f.toDouble + 0.2f.toDouble * 0.5f.toDouble +
      0.3f.toDouble * 0.6f.toDouble
    assert(viaPlan === manual)
  }

  test("lshSignatures: deterministic, tables-length, bit-bounded") {
    val df = Seq((1L, Array.fill(16)(0.5f)), (2L, Array.fill(16)(-0.5f))).toDF("id", "v")
    val sigs = df.select(col("id"),
        VectorExprs.lshSignatures(col("v"), tables = 4, bits = 8).as("s"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(sigs.forall(_._2.length === 4))
    assert(sigs.forall(_._2.forall(s => s >= 0 && s < 256)))
    // antipodal vectors get complementary signatures
    assert(sigs(0)._2.zip(sigs(1)._2).forall { case (a, b) => (a ^ b) === 255L })
  }

  test("shingles: distinct, ordered, empty under k tokens") {
    val df = Seq("a b a b a", "a b", "", "  Mixed   CASE text  ").toDF("t")
    val out = df.select(TextHashExprs.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(out(0) === Seq("a b a", "b a b"))        // dups removed, order kept
    assert(out(1) === Nil)
    assert(out(2) === Nil)
    assert(out(3) === Seq("mixed case text"))       // lowercased, ws collapsed
  }

  test("minhashSig: null under k tokens; identical docs share signatures") {
    val df = Seq((1L, "one two three four"), (2L, "one two three four"), (3L, "x y")).toDF("id", "t")
    val sigs = df.select(col("id"), TextHashExprs.minhashSig(col("t"), 3, 8).as("s"))
      .orderBy("id").as[(Long, Option[Seq[Long]])].collect()
    assert(sigs(0)._2 === sigs(1)._2)
    assert(sigs(0)._2.get.length === 8)
    assert(sigs(2)._2 === None)
  }

  test("simhash64 equals the xxhash64 groupBy formulation it replaced") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum dolor sit amet")).toDF("id", "t")
    val native = docs.select(col("id"), TextHashExprs.simhash64(col("t")).as("sh"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // reconstruct via Spark's own xxhash64 over exploded tokens
    val toks = docs.select(col("id"),
        explode(split(trim(lower(col("t"))), "\\s+")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map(b =>
      sum(when(call_function("shiftright", col("h"), lit(b)).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val agg = toks.groupBy("id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    val reference = agg.select(col("id"), sim.as("sh"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(native === reference)
  }

  test("GraftFunctions: native expressions callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Seq((Array(3.0f, 4.0f), Array(1.0f, 0.0f), "the quick brown fox the end"))
      .toDF("a", "b", "t").createOrReplaceTempView("gf_test")
    val row = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_norm(a) AS n, vec_cosine(a, a) AS c,
        |       size(text_shingles(t, 3)) AS ns, size(minhash_sig(t, 3, 8)) AS nm,
        |       simhash64(t) AS sh, text_quality(t).n_tokens AS nt,
        |       vec_sqdist(a, b) AS sq,
        |       multi_match_count(t, array('quick', 'brown fox', 'zzz')) AS mm
        |FROM gf_test""".stripMargin).collect().head
    assert(row.getAs[Double]("d") === 3.0)
    assert(row.getAs[Double]("n") === 5.0)
    assert(row.getAs[Double]("c") === 1.0)
    assert(row.getAs[Int]("ns") === 4)
    assert(row.getAs[Int]("nm") === 8)
    assert(row.getAs[Int]("nt") === 6)
    assert(row.getAs[Double]("sq") === 20.0) // (3-1)^2 + (4-0)^2
    assert(row.getAs[Long]("mm") === 2L)
    // arity errors are loud
    val err = intercept[Exception](spark.sql("SELECT vec_dot(array(1.0)) AS x").collect())
    assert(err.getMessage.contains("expects 2 arguments") ||
      err.getMessage.toLowerCase.contains("invalid"))
  }

  test("char entropy: exact values on known distributions") {
    import graft.functions.TextFeatures
    val df = Seq(
      (1L, "aabb"),     // uniform over 2 chars -> H = 1.0, ratio 1.0
      (2L, "abcd"),     // uniform over 4 -> H = 2.0
      (3L, "aaaa"),     // single char -> H = 0, ratio 0 (degenerate alphabet)
      (4L, ""),         // empty -> null struct
      (5L, "aab"))      // H = -(2/3 log2(2/3) + 1/3 log2(1/3)) ~= 0.918296
      .toDF("id", "s")
    val out = df.select(col("id"), TextFeatures.entropyStruct(col("s")).as("e"))
      .selectExpr("id", "e.n_codepoints", "e.n_distinct_chars",
        "e.char_entropy", "e.entropy_ratio")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 4 && out(1L).getInt(2) === 2)
    assert(out(1L).getDouble(3) === 1.0 && out(1L).getDouble(4) === 1.0)
    assert(out(2L).getDouble(3) === 2.0)
    assert(out(3L).getDouble(3) === 0.0 && out(3L).getDouble(4) === 0.0)
    assert(out(4L).isNullAt(1))
    assert(out(5L).getDouble(3) === 0.918296)
  }

  test("text quality: empty and whitespace-only strings") {
    val df = Seq("", "   ", "the cat!!!").toDF("text")
    val out = df.select(TextAnalysisCols.qualityFeatures(col("text")): _*)
      .as[(Int, Int, Int, Double, Double, Double)].collect().toSeq
    assert(out(0) === ((0, 0, 0, 0.0, 0.0, 0.5)))
    assert(out(1) === ((0, 0, 0, 0.0, 0.0, 0.5)))
    val (nt, ns, np, sr, pr, q) = out(2)
    assert((nt, ns, np) === ((2, 1, 3)))
    assert(sr === 0.5 && pr === 3.0 / 10.0)
    assert(q === 0.5 * 0.5 + (1.0 - 0.3) * 0.5)
  }

  test("GraftExtensions injects the function set into a configured session") {
    import org.apache.spark.sql.SparkSession
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the JVM's SparkContext; builds a NEW session with the
      // extensions applied, as spark.sql.extensions would
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(e => new GraftExtensions().apply(e))
        .getOrCreate()
      val row = s2.sql(
        "SELECT simhash64('a b c') AS h, vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head
      assert(row.getAs[Long]("h") !== 0L)
      assert(row.getAs[Double]("d") === 11.0)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("minhashWithShingles == (minhashSig, shingleHashes) bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val both = docs.select(
        TextHashExprs.minhashWithShingles(col("text"), 3, 32).as("b"),
        TextHashExprs.minhashSig(col("text"), 3, 32).as("sig0"),
        TextHashExprs.shingleHashes(col("text"), 3).as("sh0"))
      .select(col("b.sig").as("sig"), col("b.sh").as("sh"), col("sig0"), col("sh0"))
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (sig, sh, sig0, sh0) =>
      assert(sig === sig0)
      assert(sh === sh0)
    }
    // null contract: under k tokens both are null together
    val tiny = Seq("one two").toDF("text")
      .select(TextHashExprs.minhashWithShingles(col("text"), 3, 8).as("b"))
    assert(tiny.filter(col("b").isNotNull).count() === 0)
  }

  test("freqReorder: frequent hashes move to the tail, order preserved") {
    val df = Seq("a b c d e f g").toDF("text")
    val sh = df.select(TextHashExprs.shingleHashes(col("text"), 3).as("sh"))
      .as[Seq[Long]].head()
    assert(sh.length === 5)
    val freq = Array(sh(0), sh(3)).sorted // pretend these two are frequent
    val reord = df.select(TextHashExprs.freqReorder(
        TextHashExprs.shingleHashes(col("text"), 3), freq).as("r"))
      .as[Seq[Long]].head()
    assert(reord === sh.filterNot(freq.contains) ++ sh.filter(freq.contains))
    // empty frequent set is identity
    val id = df.select(TextHashExprs.freqReorder(
        TextHashExprs.shingleHashes(col("text"), 3), Array.emptyLongArray).as("r"))
      .as[Seq[Long]].head()
    assert(id === sh)
  }
}
