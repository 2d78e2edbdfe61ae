package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII redaction for training corpora: mask emails, IPv4 addresses and
 * phone-shaped digit runs with a placeholder token — the standard
 * scrub step before text enters a training set.
 *
 * All three patterns use ONLY the regex subset Java (Spark) and RE2
 * (DuckDB oracle) interpret identically: literal classes, bounded
 * repetition, non-capturing groups, `\b` — no backreferences, no
 * lookaround. `regexp_replace` is codegen'd scan-side work: redaction
 * adds zero shuffles at any scale. Order matters: emails first (their
 * local parts contain digits and dots that the looser patterns would
 * shred), then IPs (dotted digits), then phones.
 */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Replace all email/IPv4/phone matches with `token`. */
  def redactPii(c: Column, token: String = "<PII>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, token),
        Ipv4Re, token),
      PhoneRe, token)

  /** Count of PII matches in the text (for corpus audits): number of
    * placeholder tokens after redaction (literal string replace, no
    * regex — engine-portable). */
  def piiCount(c: Column, token: String = "<PII>"): Column = {
    val redacted = redactPii(c, token)
    ((length(redacted) - length(replace(redacted, lit(token), lit("")))) /
      token.length).cast("long")
  }
}
