package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The FATAL half of the SURVEY totals gate (the loud-but-non-fatal
  * half runs inside [[Verify]]): `tools/check_survey.py` recounts the
  * §2 table and cross-checks the "Current totals" prose AND the live
  * `SparkEntry.oracleSql` catalog size, so adding a catalog entry
  * without its SURVEY accounting (or editing the table without the
  * prose) fails `sbt test` — coverage claims can never drift from the
  * code again. No SparkSession needed: the catalog SQL map is static.
  */
class SurveyGateSpec extends AnyFunSuite {

  test("SURVEY prose == §2 table == live oracle catalog") {
    assume(new ProcessBuilder("python3", "--version").start().waitFor() == 0,
      "python3 unavailable")
    // the checker only counts KEYS; dummy bodies keep the file tiny
    val tmp = Files.createTempFile("graft_oracle_keys", ".json")
    try {
      Files.writeString(tmp, SparkEntry.oracleSql.keys.toSeq.sorted
        .map(k => "\"" + k + "\": \"-\"").mkString("{", ",", "}"))
      val proc = new ProcessBuilder(
        "python3", "tools/check_survey.py", tmp.toString)
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor() === 0, s"check_survey.py failed:\n$out")
    } finally Files.deleteIfExists(tmp)
  }
}
