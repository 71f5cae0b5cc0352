package graft.operators

/** Physical→LOGICAL DDL conversion for the produced global binlog: a
  * vanilla MySQL consumer replaying the log must see standard MySQL
  * DDL, so the sharding dialect's clauses are stripped — the
  * reference's `DDLConverter.convertNormalDDL`
  * (task/.../filter/rebuild/DDLConverter.java:120-260; its test pins
  * e.g. `CREATE INDEX gsi ON t (id) PARTITION BY HASH (id)` →
  * `CREATE INDEX gsi ON t (id)`).
  *
  * What converts (same item list as the reference):
  *  - CREATE TABLE: BROADCAST / SINGLE / AUTO_PARTITION markers;
  *    [DB|TB]PARTITION BY … (+ partition counts and partition lists);
  *    TABLEGROUP / JOINGROUP / LOCALITY options; the
  *    `_drds_implicit_id_` column and its PRIMARY KEY; GLOBAL /
  *    CLUSTERED index elements (dropped whole — they are sharded
  *    side tables, not local indexes); the LOCAL word on local
  *    indexes; AUTO_INCREMENT BY GROUP|SIMPLE|TIME sequence types.
  *  - ALTER TABLE: ALGORITHM=OMC items (online-modify-column is a
  *    PolarDB-X protocol, blacklisted from the logical stream);
  *    GLOBAL/CLUSTERED/LOCAL words and partition clauses inside ADD
  *    INDEX/KEY/CONSTRAINT items; sequence types on ADD/MODIFY.
  *  - CREATE INDEX: CLUSTERED/LOCAL words and trailing partition
  *    clauses.
  *  - CREATE DATABASE: PARTITION_MODE / LOCALITY options.
  * Anything else passes through unchanged.
  *
  * Implementation is SPAN SURGERY on the original text (delete the
  * recognized clauses, keep every other byte), then whitespace
  * canonicalization outside quotes — not an AST re-print, so unknown
  * syntax is preserved verbatim instead of being mangled. With `tso`
  * set, the original statement is retained as leading comments
  * (`# POLARX_ORIGIN_SQL=… / # POLARX_TSO=…`), the reference's
  * private-DDL support.
  */
object DdlConvert {

  private final case class Tok(word: String, lo: Int, hi: Int)

  /** Lex with spans; comments are skipped (not tokens). `word` is the
    * lowercase match key — quoted identifiers keep their inner name. */
  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s(i + 1) == '-') {
        while (i < n && s(i) != '\n') i += 1
      } else if (c == '#') {
        while (i < n && s(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
      } else if (c == '`') {
        val lo = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '`') {
            if (i + 1 < n && s(i + 1) == '`') { sb += '`'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += s(i); i += 1 }
        }
        out += Tok(sb.result().toLowerCase, lo, i)
      } else if (c == '\'' || c == '"') {
        val lo = i
        i += 1
        while (i < n && s(i) != c) {
          if (s(i) == '\\' && i + 1 < n) i += 1
          i += 1
        }
        i = math.min(i + 1, n)
        out += Tok(s.substring(lo, math.min(i, n)).toLowerCase, lo, i)
      } else if (c == '(' || c == ')' || c == ',' || c == '=' || c == ';') {
        out += Tok(c.toString, i, i + 1)
        i += 1
      } else if (c.isLetterOrDigit || c == '_' || c == '$') {
        val lo = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '$'))
          i += 1
        out += Tok(s.substring(lo, i).toLowerCase, lo, i)
      } else i += 1
    }
    out.result()
  }

  private val ImplicitId = "_drds_implicit_id_"
  private val AlgorithmBlacklist = Set("omc")
  private val PartitionHeads = Set("dbpartition", "tbpartition", "partition")
  private val PartitionCounts = Set("dbpartitions", "tbpartitions", "partitions")
  private val IndexMods = Set("global", "clustered", "clustering", "local")
  // first keyword of an ALTER TABLE item — terminates the table-name
  // token run (qualified names lex as multiple identifier tokens)
  private val AlterActions = Set("add", "drop", "modify", "change",
    "alter", "rename", "convert", "character", "charset", "collate",
    "default", "engine", "comment", "algorithm", "lock", "order",
    "disable", "enable", "discard", "import", "force", "with",
    "without", "auto_increment", "row_format", "partition",
    "dbpartition", "tbpartition", "remove", "exchange", "truncate",
    "coalesce", "reorganize", "analyze", "check", "optimize",
    "rebuild", "repair", "upgrade", "single", "broadcast",
    "tablegroup", "joingroup", "locality", "key_block_size", "pack_keys",
    "stats_persistent", "stats_auto_recalc", "stats_sample_pages",
    "checksum", "delay_key_write", "max_rows", "min_rows", "tablespace",
    "compression", "encryption", "union", "insert_method",
    "auto_partition", "archive")
  // top-level CREATE TABLE options that TERMINATE a partition clause
  private val OptionStops = Set("engine", "default", "character", "charset",
    "collate", "comment", "auto_increment", "row_format", "key_block_size",
    "with", "checksum", "stats_persistent", "compression", "tablespace",
    "tablegroup", "joingroup", "locality", "single", "broadcast",
    "dbpartition", "tbpartition", "partition", "auto_partition")

  def toLogicalDdl(sql: String, tso: Option[String] = None): String = {
    val toks = lex(sql)
    def kw(i: Int): String = if (i >= 0 && i < toks.length) toks(i).word else ""
    val converted: Option[String] =
      if (kw(0) == "create" || kw(0) == "alter") {
        // CREATE [UNIQUE|…] TABLE/INDEX/DATABASE — find the object word
        val objIdx = (1 until math.min(toks.length, 6)).find(i =>
          Set("table", "index", "database", "schema").contains(kw(i)))
        (kw(0), objIdx.map(kw(_)).getOrElse("")) match {
          case ("create", "table") => Some(convertCreateTable(sql, toks))
          case ("alter", "table") => Some(convertAlterTable(sql, toks))
          case ("create", "index") => Some(convertCreateIndex(sql, toks))
          case ("create", "database") | ("create", "schema") =>
            Some(convertCreateDatabase(sql, toks))
          case _ => None
        }
      } else None
    converted match {
      case None => sql // pass through verbatim (incl. DROP, RENAME, DML)
      case Some(out) =>
        tso.fold(out)(t =>
          s"# POLARX_ORIGIN_SQL=${squashWs(sql)}\n# POLARX_TSO=$t\n$out")
    }
  }

  // ---- statement transforms (each returns the rendered result) ----

  private def convertCreateTable(sql: String, toks: Vector[Tok]): String = {
    val del = Vector.newBuilder[(Int, Int)] // token-index ranges, inclusive
    // CREATE [PARTITION|BROADCAST|SINGLE] TABLE — the prefix dialect
    // words (Druid setPrefixPartition/setPrefixBroadcast,
    // DDLConverter.java:147-148) drop; TEMPORARY is vanilla and stays
    var p = 1
    while (p < toks.length && toks(p).word != "table") {
      if (Set("partition", "broadcast", "single").contains(toks(p).word))
        del += ((p, p))
      p += 1
    }
    val open = toks.indexWhere(_.word == "(")
    val close = matchParen(toks, open)
    if (open < 0 || close < 0) return squashWs(sql)
    // body elements at depth 1
    elements(toks, open, close).foreach { case (lo, hi) =>
      val head = toks(lo).word
      val words = (lo to hi).map(toks(_).word)
      val isImplicitCol = head == ImplicitId
      val isImplicitPk = head == "primary" && words.lift(1).contains("key") &&
        words.contains(ImplicitId)
      val modRun = words.takeWhile(w => IndexMods.contains(w) || w == "unique")
      val isShardedIndex = modRun.exists(w =>
        w == "global" || w == "clustered" || w == "clustering") &&
        words.lift(modRun.length).exists(w => w == "key" || w == "index")
      if (isImplicitCol || isImplicitPk || isShardedIndex)
        del += ((lo, elementEndWithComma(toks, lo, hi, open, close)))
      else {
        if (head == "local" &&
            Set("key", "index").contains(toks(lo + 1).word))
          del += ((lo, lo)) // keep the index, drop the dialect word
        dropSequenceTypes(toks, lo, hi, del)
      }
    }
    // top-level options after the body
    var i = close + 1
    while (i < toks.length) {
      val w = toks(i).word
      if (w == "broadcast" || w == "single" || w == "auto_partition") {
        del += ((i, i)); i += 1
      } else if (PartitionHeads.contains(w) && kw(toks, i + 1) == "by") {
        val end = partitionClauseEnd(toks, i)
        del += ((i, end)); i = end + 1
      } else if (PartitionCounts.contains(w)) {
        val end = if (kw(toks, i + 1) == "=") i + 2 else i + 1
        del += ((i, math.min(end, toks.length - 1))); i = end + 1
      } else if (Set("tablegroup", "joingroup", "locality").contains(w)) {
        val end = if (kw(toks, i + 1) == "=") i + 2 else i + 1
        del += ((i, math.min(end, toks.length - 1))); i = end + 1
      } else i += 1
    }
    render(sql, toks, del.result())
  }

  private def convertAlterTable(sql: String, toks: Vector[Tok]): String = {
    val del = Vector.newBuilder[(Int, Int)]
    val tblIdx = toks.indexWhere(_.word == "table")
    // items split at depth-0 commas after "alter table <name>". The
    // name may be schema-qualified (`db`.`t` lexes as TWO tokens — the
    // dot is not a token), so skip the whole name run: one mandatory
    // token, then further identifier tokens until the first ALTER
    // action keyword. Leaving a name token inside item 1 breaks the
    // ADD-prefix guard below and lets GLOBAL/CLUSTERED leak through.
    var start = tblIdx + 2
    while (start < toks.length && !AlterActions.contains(toks(start).word) &&
        toks(start).word != "(" && toks(start).word != ",")
      start += 1
    var itemStarts = Vector(start)
    var depth = 0
    var i = start
    while (i < toks.length) {
      toks(i).word match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case "," if depth == 0 => itemStarts :+= i + 1
        case _ => ()
      }
      i += 1
    }
    val itemEnds = itemStarts.drop(1).map(_ - 2) :+ (toks.length - 1)
    itemStarts.zip(itemEnds).foreach { case (lo, hi) =>
      if (lo <= hi) {
        val words = (lo to hi).map(toks(_).word)
        val isBlacklistedAlgo = words.headOption.contains("algorithm") &&
          words.drop(1).dropWhile(_ == "=").headOption
            .exists(AlgorithmBlacklist.contains)
        if (isBlacklistedAlgo)
          del += ((lo, elementEndWithComma(toks, lo, hi, -1, toks.length)))
        else {
          // OMC also rides WITHOUT a comma on the emitting dialect
          // ("change column c cc bigint first ALGORITHM=OMC") — strip
          // the trailing option tokens from an otherwise-kept item
          (lo to hi).foreach { j =>
            if (toks(j).word == "algorithm" && j > lo) {
              val (valIdx, end) =
                if (kw(toks, j + 1) == "=") (j + 2, j + 2) else (j + 1, j + 1)
              if (AlgorithmBlacklist.contains(kw(toks, valIdx)))
                del += ((j, end))
            }
          }
          // ADD [UNIQUE] {GLOBAL|CLUSTERED|LOCAL} INDEX/KEY …: drop the
          // dialect words and any partition sub-clauses inside the item
          (lo to hi).foreach { j =>
            val w = toks(j).word
            if (IndexMods.contains(w) &&
                (lo until j).forall(k => Set("add", "unique", "constraint")
                  .contains(toks(k).word) || IndexMods.contains(toks(k).word)) &&
                (j + 1 to hi).exists(k =>
                  Set("key", "index").contains(toks(k).word)))
              del += ((j, j))
            if (PartitionHeads.contains(w) && kw(toks, j + 1) == "by" &&
                depthAt(toks, j) == 0)
              del += ((j, math.min(partitionClauseEnd(toks, j), hi)))
            if (PartitionCounts.contains(w) && depthAt(toks, j) == 0)
              del += ((j, if (kw(toks, j + 1) == "=") j + 2 else j + 1))
          }
          dropSequenceTypes(toks, lo, hi, del)
        }
      }
    }
    render(sql, toks, del.result())
  }

  private def convertCreateIndex(sql: String, toks: Vector[Tok]): String = {
    val del = Vector.newBuilder[(Int, Int)]
    val idxWord = toks.indexWhere(_.word == "index")
    (1 until idxWord).foreach { i =>
      if (IndexMods.contains(toks(i).word)) del += ((i, i))
    }
    var i = idxWord
    while (i < toks.length) {
      val w = toks(i).word
      if (PartitionHeads.contains(w) && kw(toks, i + 1) == "by" &&
          depthAt(toks, i) == 0) {
        val end = partitionClauseEnd(toks, i)
        del += ((i, end)); i = end + 1
      } else if (PartitionCounts.contains(w) && depthAt(toks, i) == 0) {
        val end = if (kw(toks, i + 1) == "=") i + 2 else i + 1
        del += ((i, math.min(end, toks.length - 1))); i = end + 1
      } else i += 1
    }
    render(sql, toks, del.result())
  }

  private def convertCreateDatabase(sql: String, toks: Vector[Tok]): String = {
    val del = Vector.newBuilder[(Int, Int)]
    // PARTITION_MODE= / LOCALITY= / MODE 'auto' all map to Druid's
    // partition-mode surface (setPartitionMode(null)/setLocality(null),
    // DDLConverter.java:135-137); the db NAME position (right after
    // DATABASE/SCHEMA [IF NOT EXISTS]) is skipped so a database
    // literally named `mode` survives
    val objIdx = toks.indexWhere(t =>
      t.word == "database" || t.word == "schema")
    var nameIdx = objIdx + 1
    if (kw(toks, nameIdx) == "if") nameIdx += 3 // IF NOT EXISTS
    var i = nameIdx + 1
    while (i < toks.length) {
      if (Set("partition_mode", "locality", "mode").contains(toks(i).word) &&
          i + 1 < toks.length) {
        val end = if (kw(toks, i + 1) == "=") i + 2 else i + 1
        del += ((i, math.min(end, toks.length - 1))); i = end + 1
      } else i += 1
    }
    render(sql, toks, del.result())
  }

  // ---- shared pieces ----

  private def kw(toks: Vector[Tok], i: Int): String =
    if (i >= 0 && i < toks.length) toks(i).word else ""

  private def matchParen(toks: Vector[Tok], open: Int): Int = {
    if (open < 0) return -1
    var depth = 0
    var i = open
    while (i < toks.length) {
      toks(i).word match {
        case "(" => depth += 1
        case ")" => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Paren depth at token i relative to statement start. */
  private def depthAt(toks: Vector[Tok], i: Int): Int =
    toks.take(i).count(_.word == "(") - toks.take(i).count(_.word == ")")

  /** Depth-1 element (lo, hi) token ranges of a paren body. */
  private def elements(toks: Vector[Tok], open: Int, close: Int)
      : Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var depth = 0
    var lo = open + 1
    var i = open
    while (i <= close) {
      toks(i).word match {
        case "(" => depth += 1
        case ")" =>
          depth -= 1
          if (depth == 0 && lo < i) out += ((lo, i - 1))
        case "," if depth == 1 =>
          if (lo < i) out += ((lo, i - 1))
          lo = i + 1
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Extend an element's token range to swallow ONE adjacent comma so
    * the remaining list stays well-formed. */
  private def elementEndWithComma(toks: Vector[Tok], lo: Int, hi: Int,
      open: Int, close: Int): Int =
    if (hi + 1 < toks.length && toks(hi + 1).word == ",") hi + 1
    else hi // leading-comma case handled by render's comma cleanup

  /** `AUTO_INCREMENT BY GROUP|SIMPLE|TIME|NEW` → drop the sequence
    * type (PolarDB-X sequences; vanilla MySQL has no BY clause). */
  private def dropSequenceTypes(toks: Vector[Tok], lo: Int, hi: Int,
      del: scala.collection.mutable.Builder[(Int, Int), Vector[(Int, Int)]])
      : Unit =
    (lo to hi).foreach { j =>
      if (toks(j).word == "auto_increment" && kw(toks, j + 1) == "by" &&
          Set("group", "simple", "time", "new").contains(kw(toks, j + 2)))
        del += ((j + 1, j + 2))
    }

  /** PARTITION BY <expr …> [counts] [(partition list)] — consume until
    * a top-level option keyword or EOF. */
  private def partitionClauseEnd(toks: Vector[Tok], at: Int): Int = {
    var i = at + 2 // skip HEAD BY
    var end = at + 1
    var consumedExpr = false
    while (i < toks.length) {
      val w = toks(i).word
      if (w == "(") { val m = matchParen(toks, i); if (m < 0) return toks.length - 1; end = m; i = m + 1; consumedExpr = true }
      else if (PartitionCounts.contains(w)) {
        end = if (kw(toks, i + 1) == "=") i + 2 else i + 1
        i = end + 1
      } else if (!consumedExpr ||
          !(OptionStops.contains(w) || w == ")" || w == "," || w == ";")) {
        // the BY expression's words (RANGE, HASH, RIGHT_SHIFT, YYYYMM,
        // COLUMNS, column names…) up to its paren group / a stop word
        end = i; i += 1
        if (w != "(") consumedExpr = consumedExpr ||
          (i < toks.length && toks(i).word == "(")
      } else return end
    }
    end
  }

  /** Original text minus the deleted token spans, whitespace-squashed
    * outside quotes, dangling commas healed. */
  private def render(sql: String, toks: Vector[Tok],
      del: Vector[(Int, Int)]): String = {
    if (del.isEmpty) return squashWs(sql)
    val dead = Array.fill(toks.length)(false)
    del.foreach { case (lo, hi) =>
      (math.max(0, lo) to math.min(toks.length - 1, hi))
        .foreach(dead(_) = true)
    }
    val kept = toks.indices.filterNot(dead)
    // rebuild from kept tokens' ORIGINAL text — adjacent kept tokens
    // keep their ORIGINAL inter-token text (so `varchar(10)` stays
    // tight), a deletion gap collapses to one smart space — then fix
    // ",)" / "(," / ",," runs a deleted element can leave behind
    val sb = new StringBuilder
    kept.zipWithIndex.foreach { case (ti, k) =>
      val t = sql.substring(toks(ti).lo, toks(ti).hi)
      if (k > 0) {
        val prev = kept(k - 1)
        if (prev == ti - 1) sb ++= sql.substring(toks(prev).hi, toks(ti).lo)
        else if (needsSpace(sb.last, t.head)) sb += ' '
      }
      sb ++= t
    }
    squashWs(sb.result()
      .replaceAll(",\\s*,", ",")
      .replaceAll("\\(\\s*,", "(")
      .replaceAll(",\\s*\\)", ")")
      .replaceAll(",\\s*$", "")) // a deleted LAST item leaves ",$"
  }

  private def needsSpace(prev: Char, next: Char): Boolean = {
    def wordy(c: Char) = c.isLetterOrDigit || c == '_' || c == '$' ||
      c == '`' || c == '\'' || c == '"'
    (wordy(prev) && wordy(next)) || (prev == ',' && next != ')') ||
      (wordy(prev) && next == '(') || (prev == ')' && wordy(next)) ||
      (prev == '=' && wordy(next)) || (wordy(prev) && next == '=')
  }

  /** Whitespace runs → one space, outside quoted regions. */
  private def squashWs(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = s.length
    var lastWs = false
    while (i < n) {
      val c = s(i)
      if (c == '`' || c == '\'' || c == '"') {
        val q = c
        sb += c; i += 1
        while (i < n && s(i) != q) {
          if (s(i) == '\\' && q != '`' && i + 1 < n) { sb += s(i); i += 1 }
          sb += s(i); i += 1
        }
        if (i < n) { sb += q; i += 1 }
        lastWs = false
      } else if (c.isWhitespace) {
        if (!lastWs && sb.nonEmpty) sb += ' '
        lastWs = true
        i += 1
      } else { sb += c; lastWs = false; i += 1 }
    }
    sb.result().trim
  }
}
