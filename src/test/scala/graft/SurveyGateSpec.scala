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

  test("committed key list tools/catalog_keys.txt == live catalog (regenerated on mismatch — commit the update)") {
    // r16 (VERDICT r15 ask #6): the checker's no-argument mode reads
    // this COMMITTED list, so key-level drift fails locally between
    // driver runs. This gate keeps the committed list itself honest:
    // on mismatch it REWRITES the file from the live catalog and
    // fails once — commit the regenerated file.
    val p = java.nio.file.Paths.get("tools/catalog_keys.txt")
    val live = SparkEntry.oracleSql.keys.toSeq.sorted
    val committed =
      if (Files.exists(p)) Files.readString(p).split("\\s+").filter(_.nonEmpty).toSeq
      else Nil
    if (committed != live) {
      Files.writeString(p, live.mkString("", "\n", "\n"))
      fail(s"tools/catalog_keys.txt drifted from SparkEntry.oracleSql " +
        s"(${committed.size} committed vs ${live.size} live; " +
        s"extra=${(committed.toSet -- live).mkString(",")} " +
        s"missing=${(live.toSet -- committed).mkString(",")}) — " +
        "regenerated; commit the updated file")
    }
  }
}
