package graft.operators

/** Tolerant JSON normalization for event payloads — the engine's
  * repair-or-quarantine stance on malformed JSON, matching the
  * reference's refusal to hard-fail the stream on a broken JSON
  * payload (task/.../filter/JsonRepairUtil.java:37 rebuilds a broken
  * meta JSON instead of failing; MemoryTableMeta.java:142-146 is the
  * same log-and-continue posture for DDL). A user replaying a log with
  * a truncated or sloppily-produced JSON cell gets a repaired document
  * (or a quarantined NULL) — never a wedged stream.
  *
  * [[repair]] is a single-pass forgiving reader that RE-EMITS strict
  * JSON. Valid input is returned byte-identical (no canonicalization —
  * replay byte-stability). Tolerated damage:
  *   - truncation: unterminated strings auto-close, unclosed
  *     objects/arrays auto-close at EOF, a dangling key or ':' gets a
  *     null value
  *   - sloppy producers: single-quoted strings, unquoted object keys,
  *     trailing commas, missing commas between elements, '+'-prefixed
  *     and bare-'.' numbers, NaN/Infinity → null, bare words in value
  *     position become strings
  *   - trailing garbage after a complete top-level value is dropped
  * Anything with no recoverable top-level value returns None —
  * QUARANTINE, the caller nulls the cell and continues.
  *
  * Driver/executor-pure (no Spark types): callable from the wire
  * codecs' mapPartitions placement and from tests directly.
  */
object JsonRepair {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Strict-valid text passes through unchanged; repairable text
    * re-emits as strict JSON; hopeless text → None (quarantine). */
  def repair(text: String): Option[String] = {
    if (text == null) return None
    val trimmed = text.trim.stripPrefix("﻿")
    if (trimmed.isEmpty) return None
    if (isStrictlyValid(trimmed)) return Some(text)
    val out = new java.lang.StringBuilder
    val p = new P(trimmed)
    if (!p.value(out)) return None
    val fixed = out.toString
    // the re-emitter aims for strict output; verify rather than trust
    if (isStrictlyValid(fixed)) Some(fixed) else None
  }

  /** Repaired text, or the JSON null literal with quarantined=true. */
  def repairOrQuarantine(text: String): (String, Boolean) =
    repair(text) match {
      case Some(t) => (t, false)
      case None => ("null", true)
    }

  private def isStrictlyValid(s: String): Boolean =
    try {
      val parser = mapper.createParser(s)
      try {
        mapper.readTree(parser: com.fasterxml.jackson.core.JsonParser)
        // readTree stops at the first value — reject trailing content
        parser.nextToken() == null
      } finally parser.close()
    } catch { case _: Exception => false }

  /** Forgiving reader over `s`; each method consumes from `i` and
    * appends STRICT json to the output, returning false only when no
    * value can be shaped at all. */
  private final class P(s: String) {
    var i = 0
    private def ws(): Unit = {
      while (i < s.length && s(i).isWhitespace) i += 1
    }
    private def eof: Boolean = i >= s.length

    def value(out: java.lang.StringBuilder): Boolean = {
      ws()
      if (eof) return false
      s(i) match {
        case '{' => obj(out)
        case '[' => arr(out)
        case '"' | '\'' => { string(out); true }
        case c if c == '-' || c == '+' || c == '.' || c.isDigit =>
          number(out)
        case c if c.isLetter => word(out)
        case _ => false
      }
    }

    private def obj(out: java.lang.StringBuilder): Boolean = {
      i += 1 // '{'
      out.append('{')
      var first = true
      var open = true
      while (open) {
        ws()
        if (eof) open = false // truncated: auto-close
        else s(i) match {
          case '}' => i += 1; open = false
          case ',' => i += 1 // tolerated wherever it appears
          case _ =>
            if (!first) out.append(',')
            first = false
            key(out)
            ws()
            if (!eof && s(i) == ':') i += 1
            out.append(':')
            ws()
            // dangling key / key with no value → null
            if (eof || s(i) == '}' || s(i) == ',') out.append("null")
            else if (!value(out)) out.append("null")
        }
      }
      out.append('}')
      true
    }

    private def arr(out: java.lang.StringBuilder): Boolean = {
      i += 1 // '['
      out.append('[')
      var first = true
      var open = true
      while (open) {
        ws()
        if (eof) open = false
        else s(i) match {
          case ']' => i += 1; open = false
          case ',' => i += 1
          case _ =>
            val mark = out.length()
            if (!first) out.append(',')
            if (value(out)) first = false
            else { out.setLength(mark); i += 1 } // skip one junk char
        }
      }
      out.append(']')
      true
    }

    /** Object key: quoted string or a bare identifier run. */
    private def key(out: java.lang.StringBuilder): Unit = {
      ws()
      if (!eof && (s(i) == '"' || s(i) == '\'')) string(out)
      else {
        val start = i
        while (i < s.length && s(i) != ':' && s(i) != ',' &&
            s(i) != '}' && !s(i).isWhitespace) i += 1
        emitString(out, s.substring(start, i))
      }
    }

    /** Consume a quoted string (either quote char, auto-close at EOF),
      * re-emit double-quoted with strict escaping. */
    private def string(out: java.lang.StringBuilder): Unit = {
      val q = s(i)
      i += 1
      val sb = new java.lang.StringBuilder
      var closed = false
      while (!closed && i < s.length) {
        val c = s(i)
        if (c == q) { closed = true; i += 1 }
        else if (c == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' if i + 5 < s.length &&
                s.substring(i + 2, i + 6).forall(isHex) =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16)
                .toChar)
              i += 6
            case other => sb.append(other); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      emitString(out, sb.toString)
    }

    private def isHex(c: Char): Boolean =
      c.isDigit || ('a' <= c.toLower && c.toLower <= 'f')

    private def emitString(out: java.lang.StringBuilder,
        v: String): Unit = {
      out.append('"')
      v.foreach {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case c if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
        case c => out.append(c)
      }
      out.append('"')
    }

    private def number(out: java.lang.StringBuilder): Boolean = {
      val start = i
      if (s(i) == '+' || s(i) == '-') i += 1
      while (i < s.length && (s(i).isDigit || s(i) == '.' ||
          s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') &&
            (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
      val raw = s.substring(start, i).stripPrefix("+")
      val fixed =
        if (raw.isEmpty || raw == "-" || raw == ".") return false
        else {
          val a = if (raw.startsWith(".")) "0" + raw
            else if (raw.startsWith("-.")) "-0" + raw.drop(1) else raw
          val b = if (a.endsWith(".")) a.dropRight(1) else a
          if (b.toLowerCase.endsWith("e")) b.dropRight(1) else b
        }
      try { new java.math.BigDecimal(fixed); out.append(fixed); true }
      catch { case _: NumberFormatException => false }
    }

    /** Bare word in value position: true/false/null keep their
      * meaning, NaN/Infinity quarantine to null, anything else is an
      * unquoted string. */
    private def word(out: java.lang.StringBuilder): Boolean = {
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' ||
          s(i) == '-' || s(i) == '+' || s(i) == '.')) i += 1
      s.substring(start, i) match {
        case "true" => out.append("true"); true
        case "false" => out.append("false"); true
        case "null" => out.append("null"); true
        case "NaN" | "Infinity" | "-Infinity" | "nan" | "inf" =>
          out.append("null"); true
        case w if w.nonEmpty => emitString(out, w); true
        case _ => false
      }
    }
  }
}
