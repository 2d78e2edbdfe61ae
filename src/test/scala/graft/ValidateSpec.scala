package graft

import graft.meta.ValidationRule
import graft.operators.Validate
import org.apache.spark.sql.Row

class ValidateSpec extends SparkSpecBase {
  import spark.implicits._

  private def errorsFor(df: org.apache.spark.sql.DataFrame,
                        rules: Seq[ValidationRule]): Seq[Seq[String]] =
    Validate.tagged(df, rules)
      .select(Validate.ErrorsCol).as[Seq[String]].collect().toSeq

  test("notNull / notEmpty") {
    val df = Seq(Some("x"), Some(""), None).toDF("f")
    val e = errorsFor(df, Seq(ValidationRule("f", Seq("notNull", "notEmpty"))))
    assert(e(0).isEmpty)
    assert(e(1) === Seq("f:must_be_non_empty"))
    assert(e(2) === Seq("f:must_not_be_null", "f:must_be_non_empty"))
  }

  test("isNumeric / isInteger on strings") {
    val df = Seq("12", "12.5", "abc").toDF("f")
    val e = errorsFor(df, Seq(ValidationRule("f", Seq("isNumeric", "isInteger"))))
    assert(e(0).isEmpty)
    assert(e(1) === Seq("f:must_be_integer"))
    assert(e(2) === Seq("f:must_be_numeric", "f:must_be_integer"))
  }

  test("min / max / range; null passes bound checks (reference semantics)") {
    val df = Seq(Some(5.0), Some(150.0), None).toDF("f")
    val e = errorsFor(df, Seq(ValidationRule("f", Seq("min:10", "max:100", "range:0-100"))))
    assert(e(0) === Seq("f:must_be_at_least_10.0"))
    assert(e(1) === Seq("f:must_be_at_most_100.0", "f:must_be_between_0.0_and_100.0"))
    assert(e(2).isEmpty)
  }

  test("isDate / dateBefore / dateAfter") {
    val df = Seq(
      ("2024-01-01", "2024-06-01"),
      ("2024-12-31", "2024-06-01"),
      ("garbage", "2024-06-01")).toDF("start", "end")
    val e = errorsFor(df, Seq(
      ValidationRule("start", Seq("isDate", "dateBefore:end")),
      ValidationRule("end", Seq("dateAfter:start"))))
    assert(e(0).isEmpty)
    assert(e(1) === Seq("start:must_be_before_end", "end:must_be_after_start"))
    assert(e(2).contains("start:must_be_valid_date"))
  }

  test("pattern") {
    val df = Seq("AB-123", "nope").toDF("plate")
    val e = errorsFor(df, Seq(ValidationRule("plate", Seq("pattern:^[A-Z]{2}-\\d{3}$"))))
    assert(e(0).isEmpty && e(1) === Seq("plate:must_match_pattern"))
  }

  test("split: ok keeps input schema, ko carries validation_errors") {
    val df = Seq(("a", 1), ("", 2)).toDF("name", "id")
    val (ok, ko) = Validate.split(df, Seq(ValidationRule("name", Seq("notEmpty"))))
    assert(ok.columns.toSeq === Seq("name", "id"))
    assert(ko.columns.toSeq === Seq("name", "id", Validate.ErrorsCol))
    assert(ok.count() === 1 && ko.count() === 1)
    assert(ko.select(Validate.ErrorsCol).as[Seq[String]].head ===
      Seq("name:must_be_non_empty"))
  }

  test("ANSI-safe: malformed numeric input fails validation, not the job") {
    val df = Seq("not-a-number").toDF("age")
    val e = errorsFor(df, Seq(ValidationRule("age", Seq("min:18"))))
    assert(e(0) === Seq("age:must_be_at_least_18.0"))
  }
}
