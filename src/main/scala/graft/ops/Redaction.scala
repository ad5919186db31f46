package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora (the C4-family cleanup step):
  * emails, IPv4 addresses, and phone numbers are replaced with typed
  * placeholder tokens, map-only over the corpus. Patterns stay inside
  * the RE2-compatible subset (no lookarounds/backrefs) so the same regex
  * means the same thing in Spark (java.util.regex), DuckDB (RE2), and
  * any downstream engine — redaction must not depend on which engine
  * ran it.
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** Dashed phone form (US-style nnn-nnn-nnnn); deliberately strict —
    * loose phone patterns eat ordinary numbers and differ across regex
    * engines' match preferences.
    */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipCount(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCount(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
}
