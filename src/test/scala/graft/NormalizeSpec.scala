package graft

import graft.meta.FieldMapping
import graft.operators.Normalize

class NormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Motor-policy-shaped nested fixture (reference's domain). */
  private def policies = spark.read.json(Seq(
    """{"policy_id":1,"driver":{"age":34,"license":{"number":"L-1"}},"vehicle":{"plate":"AB-123"},"premium":120.5}""",
    """{"policy_id":2,"driver":{"age":null,"license":{"number":"L-2"}},"vehicle":{"plate":"CD-456"},"premium":99.0,"driver_age":41}"""
  ).toDS())

  test("naming conventions") {
    assert(Normalize.applyNaming("driver.license.number", "snake_case") === "driver_license_number")
    assert(Normalize.applyNaming("driver.license.number", "keep_dot") === "driver.license.number")
    assert(Normalize.applyNaming("driver.license.number", "camelCase") === "driverLicenseNumber")
    intercept[IllegalArgumentException](Normalize.applyNaming("a.b", "PascalCase"))
  }

  test("auto-discovery flattens nested leaves with snake_case names") {
    val out = Normalize.normalizeFields(policies, Nil)
    assert(out.columns.contains("driver_age"))
    assert(out.columns.contains("driver_license_number"))
    assert(out.columns.contains("vehicle_plate"))
    val rows = out.select("policy_id", "driver_license_number").orderBy("policy_id")
      .as[(Long, String)].collect()
    assert(rows.toSeq === Seq((1L, "L-1"), (2L, "L-2")))
  }

  test("explicit mapping coalesces prioritized sources (nested then flat)") {
    val out = Normalize.normalizeFields(policies,
      Seq(FieldMapping("driver_age", Seq("driver.age", "driver_age"))))
    val rows = out.select("policy_id", "driver_age").orderBy("policy_id")
      .as[(Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 34L), (2L, 41L))) // row 2 falls back to flat col
  }

  test("missing sources are skipped; all-missing mapping is dropped") {
    val out = Normalize.normalizeFields(policies,
      Seq(FieldMapping("ghost", Seq("no.such", "nope"))))
    assert(!out.columns.contains("ghost"))
  }

  test("flattenStructs is one flat projection") {
    val out = Normalize.flattenStructs(policies, "camelCase")
    assert(out.columns.contains("driverLicenseNumber"))
    assert(!out.schema.fields.exists(_.dataType.typeName == "struct"))
  }
}
