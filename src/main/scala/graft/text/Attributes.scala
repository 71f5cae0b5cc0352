package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attribute tagging — "tag, don't drop". The curation pattern used by
  * the big public corpus pipelines (Dolma's attributes files, CCNet's
  * per-shard scores): quality SIGNALS are materialized as per-document
  * attribute columns in one cheap pass, and the actual drop decision is
  * a separate, revisable filter over those columns. Changing a
  * threshold re-runs a metadata-only filter, not the corpus scan; an
  * audit ("what did we drop and why") is a GROUP BY over tags.
  * Reference analog: `RplStatMetrics`-style taps that record WHY events
  * were skipped rather than silently dropping them.
  *
  * Every attribute is a pure scan-stage expression — no shuffle, no
  * UDF, no join — and integer-exact (ratio thresholds compare
  * cross-multiplied counts, never floats), so any SQL engine recomputes
  * the same tags bit-for-bit.
  */
object Attributes {

  /** Drop-signal thresholds (integer-exact: numerator·10 vs count·k). */
  val TooShortTokens = 20        // fewer whitespace tokens than this
  val LowAlphaTenths = 6         // alpha chars < 6/10 of non-space chars
  val DigitHeavyTenths = 2       // digit chars > 2/10 of non-space chars

  private def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  private def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  private def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  private def digitChars(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", ""))

  /** Kept RE2-simple so Spark (java.util.regex) and the oracle (RE2)
    * agree: no backrefs, no lookaround. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  /** Adds the attribute columns:
    *
    *  - `attr_too_short`   — token count below [[TooShortTokens]]
    *  - `attr_low_alpha`   — alphabetic share of non-space chars below
    *                         [[LowAlphaTenths]]/10 (OCR noise, markup
    *                         residue, binary-ish text)
    *  - `attr_digit_heavy` — digit share above [[DigitHeavyTenths]]/10
    *                         (tables, logs, serial dumps)
    *  - `attr_has_email` / `attr_has_url` — PII / link presence (for
    *                         routing to the scrubber, not for dropping)
    *  - `tags`             — the names of the attributes that fired,
    *                         sorted (the Dolma attributes-file shape)
    *  - `keep`             — the default drop policy: none of the three
    *                         drop signals fired (email/url are signals
    *                         for downstream scrubbing, not drops)
    */
  def tag(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val tagArray = array_compact(array(
      when(col("attr_too_short"), lit("too_short")),
      when(col("attr_low_alpha"), lit("low_alpha")),
      when(col("attr_digit_heavy"), lit("digit_heavy")),
      when(col("attr_has_email"), lit("has_email")),
      when(col("attr_has_url"), lit("has_url"))))
    df.withColumn("attr_too_short", tokenCount(t) < TooShortTokens)
      .withColumn("attr_low_alpha",
        alphaChars(t) * 10 < nonSpaceChars(t) * LowAlphaTenths)
      .withColumn("attr_digit_heavy",
        digitChars(t) * 10 > nonSpaceChars(t) * DigitHeavyTenths)
      .withColumn("attr_has_email", t.rlike(EmailPattern))
      .withColumn("attr_has_url", t.rlike(UrlPattern))
      .withColumn("tags", tagArray)
      .withColumn("keep",
        !(col("attr_too_short") || col("attr_low_alpha") ||
          col("attr_digit_heavy")))
  }

  /** The audit view: how many documents carry each tag — the "what
    * would we drop and why" report. One explode + one aggregation. */
  def tagReport(tagged: DataFrame): DataFrame =
    tagged.select(explode(col("tags")).as("tag"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n_docs"))
}
