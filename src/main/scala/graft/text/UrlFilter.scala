package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and domain-blocklist filtering — the curation step
  * that drops documents citing known-bad sources before anything else
  * spends compute on them.
  *
  * The pattern set is the Java-regex ∩ RE2 portable subset (same
  * discipline as [[Scrub]]): no backrefs, no lookaround, explicit
  * character classes — so the DuckDB oracle runs the IDENTICAL pattern
  * text and must produce identical extractions.
  *
  * Scale shape: the blocklist is config-sized by nature (thousands of
  * domains, not billions), so it collapses to ONE broadcast row
  * (`collect_set`) and the filter evaluates in the corpus's scan
  * stage — the documents table never shuffles, never anti-joins. A
  * blocklist too large to broadcast is a data-modeling smell (it has
  * become a dataset — join it at ingest and persist the flag).
  */
object UrlFilter {

  /** Conservative scheme+host matcher. Case-insensitive via the inline
    * `(?i)` flag (Java regex ∩ RE2 — hosts are case-insensitive, so
    * `HTTP://SPAM.EXAMPLE` must not slip a blocklist). Group-free —
    * extraction uses match group 0 explicitly (Spark defaults to
    * group 1, DuckDB to 0). */
  val UrlPattern = "(?i)https?://[a-z0-9.-]+"

  /** All URL (scheme+host) mentions in `text`, in document order,
    * original casing preserved. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Hosts of all URL mentions: scheme stripped, LOWERCASED — the
    * canonical form blocklists are written in. */
  def domains(text: Column): Column =
    transform(urls(text),
      u => lower(regexp_replace(u, lit("(?i)^https?://"), lit(""))))

  /** `docs` minus every document that mentions a blocked domain.
    * `blocklist(domainCol)` is collapsed to a single broadcast row;
    * documents with no URLs — including NULL text — always survive
    * (the overlap test is null-coalesced: a three-valued-logic null
    * here would silently drop every null-text row at the filter). */
  def dropBlockedDomains(docs: DataFrame, textCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val bl = blocklist
      .agg(collect_set(lower(col(domainCol))).as("graft_blocked_domains"))
    docs.crossJoin(broadcast(bl))
      .filter(!coalesce(
        arrays_overlap(domains(col(textCol)), col("graft_blocked_domains")),
        lit(false)))
      .drop("graft_blocked_domains")
  }
}
