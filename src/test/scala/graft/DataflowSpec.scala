package graft

import graft.meta.MetaLoader
import org.apache.spark.sql.functions._

class DataflowSpec extends SparkSpecBase {
  import spark.implicits._

  test("metadata spec compiles to plans and writes sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flow").toString
    Seq(
      """{"policy_id":1,"driver":{"age":34},"premium":"120.5"}""",
      """{"policy_id":2,"driver":{"age":15},"premium":"99.0"}""",
      """{"policy_id":3,"driver":{"age":null},"premium":"oops"}""")
      .toDS().coalesce(1).write.mode("overwrite").text(s"$dir/in")
    val spec =
      s"""{"dataflows":[{
         |"name":"motor",
         |"sources":[{"name":"raw","path":"$dir/in","format":"json"}],
         |"transformations":[
         |  {"name":"norm","type":"normalize_fields","params":{"input":"raw","output":"n","fields":[]}},
         |  {"name":"val","type":"validate_fields","params":{"input":"n",
         |    "validations":[{"field":"driver_age","validations":["notNull","min:18"]},
         |                   {"field":"premium","validations":["isNumeric"]}],
         |    "ok_output":"ok","ko_output":"ko"}}],
         |"sinks":[
         |  {"input":"ok","name":"okSink","paths":["$dir/ok"],"format":"parquet","saveMode":"overwrite"},
         |  {"input":"ko","name":"koSink","paths":["$dir/ko"],"format":"csv","saveMode":"overwrite"}]
         |}]}""".stripMargin
    val flow = MetaLoader.loadString(spec).dataflow("motor")
    Dataflow.run(spark, flow)
    val ok = spark.read.parquet(s"$dir/ok")
    assert(ok.select("policy_id").as[Long].collect().toSeq === Seq(1L))
    // KO csv: validation_errors array flattened to comma-joined string
    val ko = spark.read.option("header", "true").csv(s"$dir/ko")
    val errs = ko.select("validation_errors").as[String].collect().toSet
    assert(errs === Set(
      "driver_age:must_be_at_least_18.0",
      "driver_age:must_not_be_null,premium:must_be_numeric"))
  }

  test("unknown transformation type fails loudly") {
    val bad = """{"dataflows":[{"name":"x","sources":[],"transformations":[
                |{"name":"t","type":"frobnicate","params":{"input":"a"}}],"sinks":[]}]}""".stripMargin
    intercept[IllegalArgumentException](MetaLoader.loadString(bad))
  }

  test("stats ops: single-pass field stats match a manual count") {
    val df = Seq((1, Some(1.0)), (2, None), (3, Some(3.0))).toDF("id", "v")
    val st = graft.operators.StatsOp.fieldStats(df, Seq("v")).collect().head
    assert(st.getAs[Long]("null_count") === 1L)
    assert(st.getAs[Long]("non_null_count") === 2L)
    assert(st.getAs[Long]("distinct_count") === 2L)
    assert(st.getAs[Double]("min_num") === 1.0)
    assert(st.getAs[Double]("max_num") === 3.0)
  }

  test("fieldStats plans exactly one aggregate (one scan, N fields)") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
    val plan = graft.operators.StatsOp
      .fieldStats(df, Seq("l_quantity", "l_discount", "l_tax", "l_orderkey"))
      .queryExecution.optimizedPlan
    val scans = plan.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if l.getClass.getSimpleName == "LogicalRelation" => l }
    assert(scans.size === 1, s"expected 1 scan, plan:\n$plan")
  }
}
