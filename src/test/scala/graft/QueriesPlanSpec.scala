package graft

/**
 * Physical-plan assertions for the catalog queries whose 100 TB
 * behavior hinges on a plan property (not just a correct answer).
 */
class QueriesPlanSpec extends SparkSpecBase {

  test("pipeline_docs never shuffles raw document text as a partition key") {
    val plan = Queries.pipelineDocs(spark, sf())
      .queryExecution.executedPlan.toString
    // the exact-dedup window must partition on the md5 fingerprint,
    // never on the text column itself
    assert(!plan.contains("hashpartitioning(text#"),
      s"raw text used as a shuffle key:\n$plan")
    assert(plan.contains("md5"), s"expected fingerprint key in plan:\n$plan")
  }

  test("ngram jaccard candidate join carries the length + positional bounds") {
    val plan = Queries.dedupNgramJaccard(spark, sf())
      .queryExecution.optimizedPlan.toString
    // the mutual size bound and the max-overlap bound are join-side
    assert(plan.contains("sz"), s"expected size columns in join:\n$plan")
    assert(plan.contains("least"), s"expected positional bound in join:\n$plan")
  }

  test("field_stats pushes only the projected columns to the scan") {
    val plan = Queries.fieldStatsQ(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_comment"),
      s"scan reads columns the query never touches:\n$plan")
  }
}
