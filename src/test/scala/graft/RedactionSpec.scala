package graft

import graft.functions.Redaction
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpecBase {
  import spark.implicits._

  private def redact(s: String): (String, Long) =
    Seq(s).toDF("t")
      .select(Redaction.redactPii(col("t")).as("r"), Redaction.piiCount(col("t")).as("n"))
      .as[(String, Long)].head()

  test("emails, phones and IPv4s are masked; plain text untouched") {
    assert(redact("mail me at jane.doe+spam@sub.example.co.uk thanks") ===
      (("mail me at <PII> thanks", 1L)))
    assert(redact("call +1 (555) 010-7788 now") === (("call <PII> now", 1L)))
    assert(redact("server at 192.168.001.12 responded") ===
      (("server at <PII> responded", 1L)))
    assert(redact("no pii here, just 42 and v1.2 markers") ===
      (("no pii here, just 42 and v1.2 markers", 0L)))
  }

  test("mixed text counts every match; email local digits don't leak to phone") {
    val (r, n) = redact("a@b.io then 10.0.0.1 then +44 20 7946 0958 end")
    assert(r === "<PII> then <PII> then <PII> end")
    assert(n === 3L)
  }
}
