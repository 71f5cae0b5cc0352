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

  /** Canonical form of a full URL for crawl dedup: lowercased (hosts
    * are case-insensitive; full-URL lowercasing is a deliberate,
    * documented simplification for dedup keys), scheme and leading
    * `www.` stripped, fragment dropped, tracking query parameters
    * (`utm_*`, `fbclid`, `gclid`) removed with the separators
    * re-tidied. Two crawls of the same page with different tracking
    * junk canonicalize to the same key. Portable-regex subset only —
    * the oracle runs the identical pattern text. */
  def canonicalizeUrl(url: Column): Column = {
    val track = "(utm_[a-z]+|fbclid|gclid)=[^&#]*"
    val lowered = lower(url)
    val noScheme = regexp_replace(lowered, lit("^https?://(www\\.)?"), lit(""))
    val noFrag = regexp_replace(noScheme, lit("#.*$"), lit(""))
    // three GROUP-FREE removal rules (replacements with backreferences
    // spell differently in Java regex vs the oracle's RE2 — avoided):
    // 1. every "&"-prefixed tracking param goes outright;
    // 2. a tracking param directly after "?" WITH a param behind it
    //    takes the following "&"'s place as "?";
    // 3. a tracking param directly after "?" at end-of-string goes
    //    with its "?". After rule 1, at most one of 2/3 can match.
    val amp = regexp_replace(noFrag, lit("&" + track), lit(""))
    val qMid = regexp_replace(amp, lit("\\?" + track + "&"), lit("?"))
    regexp_replace(qMid, lit("\\?" + track + "$"), lit(""))
  }

  /** Crawl-recency dedup: one row per canonical URL — the highest
    * `orderCol` (crawl sequence / fetch time) version wins —
    * with the version count for audit. Winner election is
    * groupBy(canonical).agg(max(struct(order))) — map-side combinable,
    * the same hot-key-safe shape as ParagraphDedup/SpanDedup: a URL
    * crawled 10⁶ times partial-aggregates in the map stage instead of
    * funneling one window task. */
  def dedupByUrl(docs: DataFrame, urlCol: String, orderCol: String)
      : DataFrame =
    docs.select(canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(orderCol))
      .groupBy(col("canonical_url"))
      .agg(max(col(orderCol)).as("kept"),
        count(lit(1)).as("n_versions"))

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
