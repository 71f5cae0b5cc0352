package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale corpus curation: tokenization, language
  * ID, quality scoring, fingerprinting. All pure Column expressions —
  * codegen'd, no UDFs, so they stay inside whole-stage codegen and scale
  * linearly over a 100 TB documents table.
  *
  * (Extension beyond the reference surface — the training-data-pipeline
  * operator family; the reference's closest analog is its per-event scalar
  * transform chain, polardbx-cdc-task/.../extractor/filter/.)
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count by whitespace split. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(tokens(text)).cast("long"))

  /** BPE-ish token estimate: counts word pieces + digits + punctuation
    * runs, the standard cheap proxy for LLM token count. */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]{1,8}|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Character n-grams of a string as an array column (language-ID and
    * fingerprint building block); boundary-padded, distinct. */
  def charNgrams(text: Column, n: Int): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    array_distinct(transform(
      sequence(lit(1), greatest(length(padded) - (n - 1), lit(0))),
      i => padded.substr(i, lit(n))))
  }

  // Tiny per-language stopword profiles (public common-word lists).
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "nicht"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"))

  // diacritics that strongly indicate one language (cheap evidence the
  // stopword overlap can miss on short texts)
  private val diacritics: Map[String, String] = Map(
    "es" -> "ñ¡¿", "fr" -> "àâçêëîïôœ", "de" -> "äöüß")

  /** Language ID: stopword overlap + diacritic evidence per language,
    * argmax wins, 'und' (undetermined) when nothing matches. A CJK
    * character-range check short-circuits zh. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores: Seq[(String, Column)] = profiles.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        val stop = size(array_intersect(toks, array(words.map(lit): _*)))
        val dia = diacritics.get(lang) match {
          case Some(chars) =>
            length(regexp_replace(lower(text), s"[^$chars]", "")) * 2
          case None => lit(0)
        }
        lang -> (stop + dia)
    }
    val best = scores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }
    val top = greatest(best: _*)
    val cjk = length(regexp_replace(text, "[^\\p{IsHan}]", "")) * 3
    when(cjk > top.getField("score"), lit("zh"))
      .when(top.getField("score") > 0, top.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality heuristics — the length / punctuation / stopword-ratio family
    * used by corpus filters (C4/Gopher-style rules, public recipes). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("long")

  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = tokens(lower(text))
    val sw = array(profiles.getOrElse(lang, profiles("en")).map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: penalizes too-short docs, missing
    * punctuation, shouting, low stopword density. Deterministic, tunable. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = least(punctCount(text).cast("double") / 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val caseScore = lit(1.0) - least(upperRatio(text) * 3.0, lit(1.0))
    round((lenScore + punctScore + stopScore + caseScore) / 4.0, 6)
  }

  /** Intra-document repetition: 1 − |distinct n-grams| / |n-grams| —
    * boilerplate/loop detection (Gopher-style repetition filters).
    * 0 = no repetition; →1 = highly repetitive. */
  def repetitionRatio(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    val total = greatest(size(toks) - (n - 1), lit(0))
    val distinctN = size(graft.functions.sketch.hashed_shingles(lower(text), n))
    when(total === 0, lit(0.0))
      .otherwise(lit(1.0) - distinctN.cast("double") / total)
  }

  /** Rolling polynomial (Rabin–Karp) fingerprint over characters, mod a
    * 31-bit prime so the accumulator can never overflow (ANSI-safe): a
    * stable, engine-independent document fingerprint for content-defined
    * chunking / shift-tolerant dedup — fp = fold (acc·31 + codepoint) mod p.
    * Defined on code points; astral-plane text may differ across engines
    * that split by UTF-16 unit vs code point. */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(2147483629L) // largest prime < 2^31
    aggregate(split(text, ""), lit(0L),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), p))
  }
}
