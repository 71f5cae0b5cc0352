package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup stripping — the first transform a web-crawled corpus
  * sees: drop tags, decode the ubiquitous entities, measure how much
  * of the raw bytes were actually prose.
  *
  * Patterns are the Java-regex ∩ RE2 portable subset (same discipline
  * as [[Scrub]]/[[UrlFilter]]): `<[^>]*>` deliberately treats any
  * angle-bracket run as a tag — identical semantics in every engine,
  * no HTML5 parser ambiguity. Entity decoding covers the five
  * predefined XML entities plus numeric space; anything rarer is
  * corpus-specific cleaning, not structural markup. All scan-stage
  * column expressions: no shuffle, no UDFs.
  */
object Markup {

  /** Tag matcher: an angle bracket, a non-`>` run, a closing bracket. */
  val TagPattern = "<[^>]*>"

  /** `text` with markup tags removed. */
  def stripTags(text: Column): Column =
    regexp_replace(text, lit(TagPattern), lit(""))

  /** The decode table, `&amp;` LAST so double-encoded text decodes one
    * level per pass, never two. Shared with CurationProps so the law
    * checks THIS table, not a copy. */
  val EntitySteps: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&#32;" -> " ", "&amp;" -> "&")

  /** Decode the predefined XML entities (and `&#32;`). */
  def decodeEntities(text: Column): Column =
    EntitySteps.foldLeft(text) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) }

  /** Tags stripped, entities decoded. */
  def visibleText(text: Column): Column = decodeEntities(stripTags(text))

  /** Integer-exact prose share: (visible length, raw length). The
    * ratio is the caller's division — kept as two ints so any SQL
    * engine cross-checks exactly. */
  def visibleLengths(text: Column): (Column, Column) =
    (length(visibleText(text)), length(text))
}
