package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: redact personally
  * identifying tokens (emails, phone numbers, IPv4 addresses) from a
  * text column, and count them for audit/filtering. The standard
  * pre-training cleanup step alongside dedup and quality scoring
  * (beyond the reference's own surface, like TextAnalysis/Boilerplate).
  *
  * Everything is a column expression over built-ins (regexp_replace /
  * regexp_count — codegen'd, no UDFs), so scrubbing rides the scan
  * stage: no shuffle, no state, linear in bytes — the 100 TB shape.
  *
  * Patterns are deliberately kept in the dialect-portable subset shared
  * by Java regex and RE2 (character classes, bounded repeats, \b —
  * no lookaround, no backrefs), so the same pattern text runs in
  * Spark and in DuckDB/engines for cross-checking.
  */
object Scrub {

  /** user@host.tld — local part per common practical syntax. */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN / NNN.NNN.NNNN (North-American shape; extend per
    * locale — redaction patterns are a policy input, not a constant). */
  val PhonePattern: String =
    "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — 999.0.0.1 matches; redaction favors
    * recall over precision). */
  val Ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, EmailToken)

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, PhoneToken)

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, IpToken)

  /** All redactions, email → phone → IP. Order is part of the contract:
    * patterns must see the ORIGINAL text shape (a cross-engine check
    * must chain in the same order). Idempotent — the replacement tokens
    * match none of the patterns. */
  def redactAll(text: Column): Column =
    redactIps(redactPhones(redactEmails(text)))

  /** Redaction counts (bigint) for audit and threshold filtering —
    * count on the PRE-redaction text. */
  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("bigint")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("bigint")

  def ipCount(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern)).cast("bigint")
}
