package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 5L), (2L, Some("b"), 15L), (3L, None, 25L),
    (4L, Some("b"), -1L), (4L, Some("c"), 9L))
    .toDF("id", "tag", "v")

  private def rep(checks: Seq[Check]) =
    Expectations.report(df, checks)
      .as[(String, Boolean, Long)].collect().toSeq

  test("each check: pass/fail semantics and violation counts, integer arithmetic") {
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val out = rep(Seq(
      RowCountBetween(1, 10),          // 5 rows: ok
      RowCountBetween(6, 10),          // fail, observed 5
      Unique(Seq("id")),               // id 4 twice: 1 excess
      Unique(Seq("id", "v")),          // tuples unique: ok
      NullFraction("tag", 2000),       // 1/5 null = 2000bp: ok (<=)
      NullFraction("tag", 1999),       // fail
      InRange("v", 0, 100),            // -1 out: 1 violation
      AcceptedValues("tag", Seq("a", "b")), // one 'c' row; nulls pass
      AcceptedValues("tag", Seq("a", "b", "c")), // ok
      MinPerGroup("tag", 2),           // 'a' and 'c' have 1 row: 2 bad groups
      MinPerGroup("tag", 1),           // all present groups >= 1: ok
      SubsetOf("id", ref, "k", "ref"))) // id 4 orphan: 2 rows
    assert(out == Seq(
      ("row_count_between(1,10)", true, 5L),
      ("row_count_between(6,10)", false, 5L),
      ("unique(id)", false, 1L),
      ("unique(id,v)", true, 0L),
      ("null_fraction(tag,2000bp)", true, 1L),
      ("null_fraction(tag,1999bp)", false, 1L),
      ("in_range(v,0,100)", false, 1L),
      ("accepted_values(tag,a|b)", false, 1L),
      ("accepted_values(tag,a|b|c)", true, 0L),
      ("min_per_group(tag,2)", false, 2L),
      ("min_per_group(tag,1)", true, 0L),
      ("subset_of(id,ref.k)", false, 2L)))
    assert(!Expectations.passes(df, Seq(Unique(Seq("id")))))
    assert(Expectations.passes(df, Seq(Unique(Seq("id", "v")))))
  }

  test("unique ignores null tuples (SQL semantics); null rows don't count as duplicates") {
    val d = Seq(Some(1L), None, None, Some(1L)).toDF("k")
    val out = Expectations.report(d, Seq(Unique(Seq("k"))))
      .as[(String, Boolean, Long)].collect().head
    assert(out == (("unique(k)", false, 1L)), s"got $out")
  }

  test("parse compiles the metadata grammar; bad specs rejected") {
    val ref = Seq(1L).toDF("k")
    def resolve(n: String) = { assert(n == "dim"); ref }
    assert(parse("row_count:1-10", resolve) == RowCountBetween(1, 10))
    assert(parse("unique:a+b", resolve) == Unique(Seq("a", "b")))
    assert(parse("null_bp:tag:250", resolve) == NullFraction("tag", 250))
    assert(parse("range:v:0-100", resolve) == InRange("v", 0, 100))
    assert(parse("min_per_group:src:100", resolve) == MinPerGroup("src", 100))
    assert(parse("accepted_values:lang:en|de|fr", resolve) ==
      AcceptedValues("lang", Seq("en", "de", "fr")))
    parse("subset:id:dim.k", resolve) match {
      case SubsetOf("id", _, "k", "dim") => ()
      case other => fail(s"got $other")
    }
    intercept[IllegalArgumentException] { parse("nope:x", resolve) }
    intercept[IllegalArgumentException] { parse("row_count:10", resolve) }
    intercept[IllegalArgumentException] { parse("subset:id:nodot", resolve) }
  }

  test("metadata gate: fail_on_violation aborts the pipeline naming the failing checks; report lands otherwise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_expect").toString
    df.write.mode("overwrite").parquet(s"$dir/in.parquet")
    def flow(fail: Boolean) = graft.meta.DataflowSpec(
      name = "f",
      sources = Seq(graft.meta.SourceSpec(name = "in",
        path = s"$dir/in.parquet", format = "parquet")),
      transformations = Seq(graft.meta.ExpectSpec(
        name = "gate", input = "in", output = "rep",
        checks = Seq("row_count:1-10", "unique:id"),
        failOnViolation = fail)),
      sinks = Seq(graft.meta.SinkSpec(input = "rep", name = "out",
        paths = Seq(s"$dir/rep"), format = "parquet",
        saveMode = "overwrite")))
    val e = intercept[IllegalStateException] { Dataflow.run(spark, flow(true)) }
    assert(e.getMessage.contains("unique(id)") &&
      e.getMessage.contains("observed=1"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/rep")),
      "a failed gate must abort BEFORE any sink runs")
    Dataflow.run(spark, flow(false))
    val rep = spark.read.parquet(s"$dir/rep")
      .as[(String, Boolean, Long)].collect().toSet
    assert(rep == Set(("row_count_between(1,10)", true, 5L),
      ("unique(id)", false, 1L)))
  }
}
