package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal MySQL-dialect DDL parser + schema-state fold: turn a log of raw
  * DDL *text* into versioned table schemas.
  *
  * Reference semantics: MemoryTableMeta.apply feeds each DDL string from the
  * binlog through a SQL repository to maintain the time-versioned schema
  * store (polardbx-cdc-canal/.../tsdb/MemoryTableMeta.java:122-147); row
  * events then resolve their column layout as of their position
  * (polardbx-cdc-meta/.../PolarDbXTableMetaManager.java:103). The repo's
  * SchemaCatalog consumed pre-structured schema rows; this parser closes the
  * gap so a raw `CREATE TABLE` / `ALTER TABLE` log folds directly.
  *
  * Spark shape: the DDL log is data — (tso, defaultSchema, ddlText). Parsing
  * is a pure per-row function; the *fold* is order-dependent per schema, so
  * it runs as groupByKey(schemaName).flatMapGroups — distributed across
  * schemas, sequential within one (a single schema's DDL history is tiny
  * relative to the event stream, exactly the reference's in-memory-repository
  * assumption). Output rows feed SchemaCatalog.versions/resolve unchanged.
  *
  * Supported statements (case-insensitive, backtick identifiers, column
  * flags NOT NULL / DEFAULT / AUTO_INCREMENT / COMMENT skipped):
  *   CREATE TABLE [IF NOT EXISTS] [s.]t (col type ..., PRIMARY KEY (c,...))
  *   ALTER TABLE [s.]t ADD [COLUMN] c type [FIRST|AFTER c] | DROP [COLUMN] c
  *     | MODIFY [COLUMN] c type | CHANGE [COLUMN] old new type
  *     | RENAME COLUMN old TO new | RENAME TO t2 | ADD PRIMARY KEY (...)
  *     | DROP PRIMARY KEY | (ADD INDEX/KEY/UNIQUE/CONSTRAINT → ignored)
  *     — multiple comma-separated actions per statement
  *   DROP TABLE [IF EXISTS] [s.]t   RENAME TABLE a TO b[, ...]
  *   TRUNCATE [TABLE] t (schema no-op)   CREATE/DROP INDEX (no-op)
  *   CREATE/DROP DATABASE|SCHEMA s
  */
object DdlParser {

  case class ColumnDef(name: String, dataType: String)

  /** Folded table state; json is the deterministic schemaJson emitted into
    * the catalog (stable key order, definition-ordered columns). */
  case class TableState(columns: Vector[ColumnDef], pk: Vector[String]) {
    def json: String = {
      val cols = columns
        .map(c => s"""{"name":"${c.name}","type":"${c.dataType}"}""")
        .mkString("[", ",", "]")
      val pkj = pk.map(p => s""""$p"""").mkString("[", ",", "]")
      s"""{"columns":$cols,"pk":$pkj}"""
    }
    def colNames: String = columns.map(_.name).mkString(",")
  }

  object TableState {
    private val ColRe = """\{"name":"([^"]+)","type":"([^"]+)"\}""".r
    private val PkRe = """"pk":\[([^\]]*)\]""".r

    /** Parse the catalog's own schemaJson back into a state — the
      * snapshot-bootstrap entry point (the format is ours and
      * deterministic, so a targeted parse suffices). */
    def fromJson(json: String): TableState = {
      val cols = ColRe.findAllMatchIn(json)
        .map(m => ColumnDef(m.group(1), m.group(2))).toVector
      val pk = PkRe.findFirstMatchIn(json)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")).filter(_.nonEmpty).toVector)
        .getOrElse(Vector.empty)
      TableState(cols, pk)
    }
  }

  // ---- statement model ----

  sealed trait Stmt
  case class CreateTableLike(schema: String, table: String,
      srcSchema: String, srcTable: String, ifNotExists: Boolean) extends Stmt
  /** CREATE TABLE t AS SELECT — `cols` None = "*"; otherwise each item is
    * (output column name, source column it carries the type of). A bare
    * ref `a` is ("a", Some("a")); an aliased single column `b AS x` is
    * ("x", Some("b")) — the clone carries b's type under the new name; an
    * aliased expression `f(a) AS n` is ("n", None) — MySQL derives its
    * type from the result set, which a log-side parser cannot, so the
    * folded column is typed "unknown". Un-aliased expressions have no
    * derivable NAME and keep the whole statement Noop. MySQL CTAS copies
    * column definitions but NOT keys — the folded clone drops the pk. */
  case class CreateTableAsSelect(schema: String, table: String,
      srcSchema: String, srcTable: String,
      cols: Option[Seq[(String, Option[String])]],
      ifNotExists: Boolean) extends Stmt
  case class CreateTable(schema: String, table: String, cols: Vector[ColumnDef],
      pk: Vector[String], ifNotExists: Boolean) extends Stmt
  case class DropTable(tables: Seq[(String, String)]) extends Stmt
  object DropTable {
    def apply(schema: String, table: String): DropTable =
      DropTable(Seq((schema, table)))
  }
  case class RenameTable(pairs: Seq[((String, String), (String, String))]) extends Stmt
  case class AlterTable(schema: String, table: String, actions: Seq[AlterAction]) extends Stmt
  case class DropSchema(schema: String) extends Stmt
  case object Noop extends Stmt

  sealed trait AlterAction
  case class AddColumn(col: ColumnDef, first: Boolean, after: Option[String]) extends AlterAction
  case class DropColumn(name: String) extends AlterAction
  case class ModifyColumn(col: ColumnDef, first: Boolean, after: Option[String]) extends AlterAction
  case class ChangeColumn(oldName: String, col: ColumnDef, first: Boolean,
      after: Option[String]) extends AlterAction
  case class RenameColumn(oldName: String, newName: String) extends AlterAction
  case class RenameTo(schema: Option[String], table: String) extends AlterAction
  case class AddPrimaryKey(cols: Vector[String]) extends AlterAction
  case object DropPrimaryKey extends AlterAction
  case object IgnoredAction extends AlterAction

  // ---- tokenizer ----

  /** Tokens: identifiers/keywords (backticks stripped), numbers, 'strings'
    * (kept quoted so flag-skipping can recognize them), and punctuation
    * `( ) , . ;`. Comments (--, #, /* */) removed. */
  private[operators] def tokenize(sql: String): Vector[String] = {
    val s = sql
    val out = Vector.newBuilder[String]
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
        // MySQL escapes a backtick INSIDE a quoted identifier by
        // doubling it: `a``b` names the single identifier a`b. Ending
        // at the first backtick would truncate the name (and strand
        // the rest of the statement as garbage tokens) — the
        // reference's corpus has real tables named this way
        // (MemoryTableMetaTest's `gxw_test``backtick`)
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '`') {
            if (i + 1 < n && s(i + 1) == '`') { sb += '`'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += s(i); i += 1 }
        }
        out += sb.result()
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        sb += c
        i += 1
        while (i < n && s(i) != c) {
          if (s(i) == '\\' && i + 1 < n) { sb += s(i); i += 1 }
          sb += s(i); i += 1
        }
        sb += c
        i += 1
        out += sb.result()
      } else if (c == '(' || c == ')' || c == ',' || c == '.' || c == ';') {
        out += c.toString
        i += 1
      } else if (c.isLetterOrDigit || c == '_' || c == '$') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '$')) i += 1
        out += s.substring(start, i)
      } else i += 1 // operators (= etc.) irrelevant to DDL shape
    }
    out.result()
  }

  // ---- type normalization (public MySQL → Spark-ish canonical names) ----

  private[operators] def normalizeType(raw: String, args: Seq[String]): String = {
    val t = raw.toLowerCase
    t match {
      case "bigint" | "int8" => "bigint"
      // SERIAL is sugar for BIGINT UNSIGNED NOT NULL AUTO_INCREMENT —
      // route it through the unsigned widening (values > Long.MaxValue
      // must FIT, the §1.2 decode contract); the UNSIGNED flag itself
      // never appears in the statement so the flag path can't catch it
      case "serial" => widenUnsigned("bigint")
      case "int" | "integer" | "mediumint" | "int4" | "int3" | "year" => "int"
      case "smallint" | "int2" => "smallint"
      case "tinyint" | "int1" =>
        if (args.headOption.contains("1")) "boolean" else "tinyint"
      case "bool" | "boolean" => "boolean"
      case "decimal" | "numeric" | "dec" | "fixed" =>
        val p = args.headOption.getOrElse("10")
        val sc = args.drop(1).headOption.getOrElse("0")
        s"decimal($p,$sc)"
      case "double" | "real" | "float8" => "double"
      case "float" | "float4" => "float"
      case "datetime" | "timestamp" => "timestamp"
      case "date" => "date"
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" |
           "enum" | "set" | "json" | "time" | "uuid" | "nchar" | "nvarchar" => "string"
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" |
           "longblob" | "bit" | "geometry" | "point" | "linestring" | "polygon" => "binary"
      case other => other // pass through unknowns rather than fail the fold
    }
  }

  // ---- parser ----

  /** Parse a possibly MULTI-statement DDL string: top-level `;`
    * (outside quotes, backticks and comments) separates statements,
    * each parsed independently — the reference's MemoryTableMeta
    * applies every statement of such a query event (its test corpus
    * has "create table t1(...);create table t2(...)"). Single
    * statements cost one contains() check extra. */
  def parseAll(ddl: String, defaultSchema: String): Seq[Stmt] =
    if (!ddl.contains(";")) Seq(parse(ddl, defaultSchema))
    else splitStatements(ddl).map(parse(_, defaultSchema))

  /** Top-level `;` split honoring the tokenizer's quote/comment rules
    * (a `;` inside a COMMENT '…' or a quoted identifier is content). */
  private[operators] def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c == ';') { out += sb.result(); sb.clear(); i += 1 }
      else if (c == '`') {
        sb += c; i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql(i) == '`') {
            if (i + 1 < n && sql(i + 1) == '`') { sb ++= "``"; i += 2 }
            else { sb += '`'; i += 1; closed = true }
          } else { sb += sql(i); i += 1 }
        }
      } else if (c == '\'' || c == '"') {
        sb += c; i += 1
        while (i < n && sql(i) != c) {
          if (sql(i) == '\\' && i + 1 < n) { sb += sql(i); i += 1 }
          sb += sql(i); i += 1
        }
        if (i < n) { sb += c; i += 1 }
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        while (i < n && sql(i) != '\n') { sb += sql(i); i += 1 }
      } else if (c == '#') {
        while (i < n && sql(i) != '\n') { sb += sql(i); i += 1 }
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        sb ++= "/*"; i += 2
        while (i + 1 < n && !(sql(i) == '*' && sql(i + 1) == '/')) {
          sb += sql(i); i += 1
        }
        if (i + 1 < n) { sb ++= "*/"; i += 2 } else i = n
      } else { sb += c; i += 1 }
    }
    out += sb.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one DDL statement. Unparseable/irrelevant statements return Noop
    * (the reference's ignoreApplyError path: log-and-continue,
    * MemoryTableMeta.java:142-146). */
  def parse(ddl: String, defaultSchema: String): Stmt = {
    val toks = tokenize(ddl)
    if (toks.isEmpty) return Noop
    val kw = toks.map(_.toLowerCase)

    def qualified(at: Int): (String, String, Int) = {
      // [schema .] table → (schema, table, nextIndex)
      if (at + 2 < toks.length && toks(at + 1) == ".")
        (toks(at).toLowerCase, toks(at + 2).toLowerCase, at + 3)
      else (defaultSchema, toks(at).toLowerCase, at + 1)
    }

    // CREATE [PARTITION|BROADCAST|SINGLE|SHADOW|TEMPORARY] TABLE —
    // PolarDB-X prefixes its auto-partition/broadcast/single dialect
    // BEFORE the object word (Druid's setPrefixPartition/
    // setPrefixBroadcast, DDLConverter.java:147-148; corpus:
    // DDLConverterTest.java:67 "CREATE PARTITION TABLE `wp_users…`").
    // TEMPORARY is vanilla MySQL in the same position.
    val createTableAt: Int =
      if (kw.head != "create") -1
      else {
        val mods = Set("partition", "broadcast", "single", "shadow",
          "temporary")
        val i = kw.indexWhere(w => !mods.contains(w), 1)
        if (i > 0 && kw.lift(i).contains("table")) i else -1
      }

    try {
      kw.head match {
        case "create" if createTableAt > 0 =>
          var i = createTableAt + 1
          var ifNotExists = false
          if (kw.lift(i).contains("if")) { ifNotExists = true; i += 3 } // IF NOT EXISTS
          val (sch, tbl, afterName) = qualified(i)
          // the column body must open IMMEDIATELY after the name: a paren
          // later in the statement (CREATE TABLE t AS SELECT f(x)...)
          // is not a definition body
          // CREATE TABLE t LIKE src | CREATE TABLE t (LIKE src) — clone
          // the source table's schema (common in operational MySQL; a
          // Noop here would leave the new table schemaless and every
          // subsequent row event on it unresolvable)
          // the paren form must be EXACTLY "( LIKE <name> )": a column
          // body whose first column happens to be named `like`
          // (backtick-quoted) would otherwise be eaten as a clone and
          // the real schema silently dropped
          def parenIsExactlyLike: Boolean =
            toks.lift(afterName).contains("(") &&
              kw.lift(afterName + 1).contains("like") && {
                val (_, _, after) = qualified(afterName + 2)
                toks.lift(after).contains(")")
              }
          val likeAt =
            if (kw.lift(afterName).contains("like")) Some(afterName + 1)
            else if (parenIsExactlyLike) Some(afterName + 2)
            else None
          // CREATE TABLE t [AS] SELECT <bare cols|*> FROM src — clone the
          // selected columns' definitions (keys are NOT copied, matching
          // MySQL CTAS); expression selects stay Noop
          val selectAt =
            if (kw.lift(afterName).contains("as") &&
              kw.lift(afterName + 1).contains("select")) Some(afterName + 2)
            else if (kw.lift(afterName).contains("select")) Some(afterName + 1)
            else None
          def parseCtas(at: Int): Option[Stmt] = {
            // top-level FROM only — a subquery's FROM sits inside parens
            var fromIdx = -1
            var d = 0
            var j = at
            while (j < toks.length && fromIdx < 0) {
              toks(j) match {
                case "(" => d += 1
                case ")" => d -= 1
                case _ if d == 0 && kw(j) == "from" => fromIdx = j
                case _ =>
              }
              j += 1
            }
            if (fromIdx < 0) return None
            // split the select list on top-level commas; each item is a
            // bare (possibly qualified) ref, or `expr AS alias`. The
            // tokenizer drops operator characters, so `a+b` arrives as
            // two adjacent identifiers — no derivable name without an
            // alias → the whole statement stays Noop. A dropped `*`
            // leaves an EMPTY list → clone-all.
            val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            var s0 = at
            d = 0
            (at until fromIdx).foreach { i =>
              toks(i) match {
                case "(" => d += 1
                case ")" => d -= 1
                case "," if d == 0 => ranges += ((s0, i)); s0 = i + 1
                case _ =>
              }
            }
            if (s0 < fromIdx) ranges += ((s0, fromIdx))
            val punct = Set("(", ")", ",", ".")
            def bareRef(s: Int, e: Int): Option[String] = (e - s) match {
              case 1 if !punct.contains(toks(s)) => Some(kw(s))
              case 3 if toks(s + 1) == "." && !punct.contains(toks(s + 2)) =>
                Some(kw(s + 2)) // qualified t.c → the column ident
              case _ => None
            }
            val items = ranges.toSeq.map { case (s, e) =>
              if (e <= s) return None // empty item (stray comma)
              // the LAST top-level AS marks the alias (CAST(x AS t) sits
              // inside parens and never matches)
              var asAt = -1
              var dd = 0
              (s until e).foreach { i =>
                toks(i) match {
                  case "(" => dd += 1
                  case ")" => dd -= 1
                  case _ if dd == 0 && kw(i) == "as" => asAt = i
                  case _ =>
                }
              }
              if (asAt >= 0) {
                if (asAt != e - 2 || punct.contains(toks(e - 1)))
                  return None // alias must be exactly one identifier
                (kw(e - 1), bareRef(s, asAt))
              } else bareRef(s, e) match {
                case Some(id) => (id, Some(id))
                case None => return None // unaliased expression: no name
              }
            }
            val (ss, st, _) = qualified(fromIdx + 1)
            val cols = if (items.isEmpty) None else Some(items)
            Some(CreateTableAsSelect(sch, tbl, ss, st, cols, ifNotExists))
          }
          likeAt match {
            case Some(at) =>
              val (ss, st, _) = qualified(at)
              CreateTableLike(sch, tbl, ss, st, ifNotExists)
            case None => selectAt.flatMap(parseCtas).getOrElse {
              if (!toks.lift(afterName).contains("(")) Noop
              else parseCreateBody(toks, kw, afterName) match {
                case Some((cols, pk)) => CreateTable(sch, tbl, cols, pk, ifNotExists)
                case None => Noop // CREATE TABLE ... AS <expr select>
              }
            }
          }
        case "create" if kw.lift(1).exists(Set("database", "schema")) => Noop
        case "create" => Noop // CREATE INDEX / VIEW / USER ...
        case "drop" if kw.lift(1).contains("table") ||
            (kw.lift(1).contains("temporary") &&
              kw.lift(2).contains("table")) =>
          // DROP [TEMPORARY] TABLE [IF EXISTS] a[, b.c, ...]
          // [CASCADE|RESTRICT] — TEMPORARY drops the same way (the
          // registry fold removes the entry either way; a session
          // temp table the registry never saw just no-ops downstream)
          var i = if (kw.lift(1).contains("temporary")) 3 else 2
          if (kw.lift(i).contains("if")) i += 2 // IF EXISTS
          val tabs = Seq.newBuilder[(String, String)]
          var more = true
          while (i < toks.length && more) {
            val (sch, tbl, j) = qualified(i)
            tabs += ((sch, tbl))
            if (toks.lift(j).contains(",")) i = j + 1 else more = false
          }
          DropTable(tabs.result())
        case "drop" if kw.lift(1).exists(Set("database", "schema")) =>
          var i = 2
          if (kw.lift(i).contains("if")) i += 2
          DropSchema(toks.lift(i).map(_.toLowerCase).getOrElse(defaultSchema))
        case "drop" => Noop
        case "truncate" => Noop
        case "rename" if kw.lift(1).contains("table") =>
          // RENAME TABLE a TO b [, c TO d]*
          val pairs = Seq.newBuilder[((String, String), (String, String))]
          var i = 2
          while (i < toks.length) {
            val (s1, t1, j) = qualified(i)
            if (kw.lift(j).contains("to")) {
              val (s2, t2, k) = qualified(j + 1)
              pairs += (((s1, t1), (s2, t2)))
              i = if (kw.lift(k).contains(",")) k + 1 else toks.length
            } else i = toks.length
          }
          RenameTable(pairs.result())
        case "alter" if kw.lift(1).contains("table") =>
          val (sch, tbl, at) = qualified(2)
          AlterTable(sch, tbl, parseAlterActions(toks, kw, at))
        case "alter" if kw.lift(1).contains("ignore") &&
            kw.lift(2).contains("table") =>
          // 5.6-era ALTER IGNORE TABLE: the IGNORE only relaxed dup-key
          // handling during the copy — schema semantics are identical,
          // and a relay can still carry such statements
          val (sch, tbl, at) = qualified(3)
          AlterTable(sch, tbl, parseAlterActions(toks, kw, at))
        case _ => Noop // DML / FLUSH / GRANT / SET ...
      }
    } catch {
      case scala.util.control.NonFatal(_) => Noop
    }
  }

  /** Column names inside a PRIMARY KEY (...) list: identifiers within the
    * paren group only — collection STOPS at the closing paren, so trailing
    * index options (`USING BTREE`) are never captured as key columns — and
    * numeric index-prefix lengths (`name(10)`) plus ASC/DESC markers are
    * skipped. Parenless input (nonstandard) falls back to all
    * non-punctuation tokens. */
  private def pkColumns(toks: Vector[String], idxs: Vector[Int]): Vector[String] = {
    val open = idxs.indexWhere(i => toks(i) == "(")
    if (open < 0)
      return idxs.map(toks)
        .filterNot(t => Set("(", ")", ",").contains(t) || t.forall(_.isDigit))
        .map(_.toLowerCase).filterNot(Set("asc", "desc"))
    var depth = 0
    var j = open
    val out = Vector.newBuilder[String]
    var done = false
    while (j < idxs.length && !done) {
      toks(idxs(j)) match {
        case "(" => depth += 1
        case ")" => depth -= 1; if (depth == 0) done = true
        case "," => ()
        case t =>
          if (depth >= 1 && !t.forall(_.isDigit) &&
            !Set("asc", "desc").contains(t.toLowerCase))
            out += t.toLowerCase
      }
      j += 1
    }
    out.result()
  }

  /** Column body of CREATE TABLE: top-level comma split inside the outermost
    * parens; PRIMARY KEY captured, KEY/INDEX/UNIQUE/CONSTRAINT/FOREIGN
    * clauses skipped. Returns None when there is no paren body. */
  private def parseCreateBody(toks: Vector[String], kw: Vector[String],
      from: Int): Option[(Vector[ColumnDef], Vector[String])] = {
    val open = toks.indexOf("(", from)
    if (open < 0) return None
    var depth = 0
    var i = open
    val groups = Vector.newBuilder[Vector[Int]] // token-index runs per item
    var cur = Vector.newBuilder[Int]
    var done = false
    while (i < toks.length && !done) {
      toks(i) match {
        case "(" =>
          if (depth > 0) cur += i
          depth += 1
        case ")" =>
          depth -= 1
          if (depth == 0) { groups += cur.result(); done = true }
          else cur += i
        case "," if depth == 1 =>
          groups += cur.result(); cur = Vector.newBuilder[Int]
        case _ => if (depth >= 1) cur += i
      }
      i += 1
    }
    val cols = Vector.newBuilder[ColumnDef]
    var pk = Vector.empty[String]
    groups.result().filter(_.nonEmpty).foreach { idxs =>
      val head = kw(idxs.head)
      if (head == "primary" && idxs.length > 1 && kw(idxs(1)) == "key") {
        pk = pkColumns(toks, idxs.drop(2))
      } else if (Set("key", "index", "unique", "constraint", "foreign",
          "fulltext", "spatial", "check").contains(head)) {
        // non-column clause — no schema effect
      } else if (isIndexClause(kw, idxs)) {
        // PolarDB-X / MySQL index-placement modifiers before KEY/INDEX:
        // LOCAL KEY, GLOBAL INDEX, CLUSTERED INDEX, [UNIQUE] GLOBAL …
        // (sharding DDL; the reference's auto-partition tables carry
        // `LOCAL KEY`). Without the lookahead, `LOCAL KEY idx (c)`
        // reads as a phantom column named `local` of type `key`. A
        // real column named `local` parses a TYPE next, never
        // KEY/INDEX, so the guard cannot eat it.
      } else {
        val name = toks(idxs.head).toLowerCase
        val (tpe, rest) = parseTypeAt(toks, kw, idxs.drop(1))
        cols += ColumnDef(name, tpe)
        // inline PRIMARY KEY flag
        val restKw = rest.map(kw)
        restKw.zipWithIndex.foreach { case (w, j) =>
          if (w == "primary" && restKw.lift(j + 1).contains("key")) pk = Vector(name)
        }
      }
    }
    Some((cols.result(), pk))
  }

  /** A leading run of index-placement modifiers followed by KEY/INDEX
    * — the PolarDB-X sharding-dialect index forms (LOCAL / GLOBAL /
    * CLUSTERED / CLUSTERING, optionally combined with UNIQUE or
    * VECTOR). At least one modifier must precede (bare KEY/INDEX is
    * handled by the plain keyword sets). */
  private def isIndexClause(kw: Vector[String], idxs: Vector[Int]): Boolean = {
    val mods = Set("local", "global", "clustered", "clustering",
      "unique", "vector")
    var j = 0
    while (j < idxs.length && mods.contains(kw(idxs(j)))) j += 1
    j > 0 && j < idxs.length && Set("key", "index").contains(kw(idxs(j)))
  }

  /** Type word + optional (args) [+ unsigned/zerofill] → normalized type.
    * Returns (type, remaining flag token indices). */
  private def parseTypeAt(toks: Vector[String], kw: Vector[String],
      idxs: Vector[Int]): (String, Vector[Int]) = {
    if (idxs.isEmpty) return ("string", Vector.empty)
    val typeWord = kw(idxs.head)
    var rest = idxs.drop(1)
    var args = Seq.empty[String]
    if (rest.nonEmpty && toks(rest.head) == "(") {
      val close = rest.indexWhere(i => toks(i) == ")")
      if (close >= 0) {
        args = rest.slice(1, close).map(toks).filterNot(_ == ",")
        rest = rest.drop(close + 1)
      }
    }
    // double precision → one type; unsigned/zerofill are flags
    if (typeWord == "double" && rest.nonEmpty && kw(rest.head) == "precision")
      rest = rest.drop(1)
    var unsigned = false
    while (rest.nonEmpty && Set("unsigned", "zerofill").contains(kw(rest.head))) {
      if (kw(rest.head) == "unsigned") unsigned = true
      rest = rest.drop(1)
    }
    val base = normalizeType(typeWord, args)
    (if (unsigned) widenUnsigned(base) else base, rest)
  }

  /** SURVEY §1.2: an unsigned integer type's value range exceeds the
    * signed Spark type of the same width — widen one step (the binlog
    * decode contract: RowsLogBuffer yields the unsigned value, which
    * must FIT). `tinyint(1)`→boolean stays boolean (a flag is a flag). */
  private[operators] def widenUnsigned(t: String): String = t match {
    case "tinyint" => "smallint"
    case "smallint" => "int"
    case "int" => "bigint"
    case "bigint" => "decimal(20,0)"
    case other => other
  }

  /** Comma-separated ALTER actions. */
  private def parseAlterActions(toks: Vector[String], kw: Vector[String],
      from: Int): Seq[AlterAction] = {
    // split on top-level commas
    val items = Vector.newBuilder[Vector[Int]]
    var cur = Vector.newBuilder[Int]
    var depth = 0
    var i = from
    while (i < toks.length) {
      toks(i) match {
        case "(" => depth += 1; cur += i
        case ")" => depth -= 1; cur += i
        case "," if depth == 0 => items += cur.result(); cur = Vector.newBuilder[Int]
        case ";" => // end
        case _ => cur += i
      }
      i += 1
    }
    items += cur.result()

    items.result().filter(_.nonEmpty).flatMap { idxs =>
      def word(j: Int): String = idxs.lift(j).map(kw).getOrElse("")
      def tok(j: Int): String = idxs.lift(j).map(toks).getOrElse("")
      def positionOf(rest: Vector[Int]): (Boolean, Option[String]) = {
        val restKw = rest.map(kw)
        val first = restKw.contains("first")
        val afterIdx = restKw.indexOf("after")
        val after = if (afterIdx >= 0 && afterIdx + 1 < rest.length)
          Some(toks(rest(afterIdx + 1)).toLowerCase) else None
        (first, after)
      }
      word(0) match {
        case "add" =>
          // MariaDB-flavor IF NOT EXISTS would otherwise read as a
          // column literally named `if`
          val base0 = if (word(1) == "column") 2 else 1
          val base = if (word(base0) == "if" && word(base0 + 1) == "not" &&
            word(base0 + 2) == "exists") base0 + 3 else base0
          if (word(base) == "primary" && word(base + 1) == "key") {
            Seq(AddPrimaryKey(pkColumns(toks, idxs.drop(base + 2))))
          } else if (Set("index", "key", "unique", "constraint", "foreign",
              "fulltext", "spatial", "check", "partition").contains(word(base))) {
            Seq(IgnoredAction)
          } else if (isIndexClause(kw, idxs.drop(base)) ||
              (word(base) == "system" && word(base + 1) == "versioning") ||
              (word(base) == "period" && word(base + 1) == "for")) {
            // guarded lookahead: ADD VECTOR INDEX (MySQL 9 / MariaDB
            // 11.7), ADD SYSTEM VERSIONING, ADD PERIOD FOR SYSTEM_TIME
            // (MariaDB temporal) are index/metadata actions — without
            // the lookahead each would mis-parse as a phantom column
            // named `vector`/`system`/`period` (a genuine column of
            // those names parses a TYPE next, never INDEX/VERSIONING/
            // FOR, so the guard cannot eat it)
            Seq(IgnoredAction)
          } else if (tok(base) == "(") {
            // MySQL paren-group form: ADD [COLUMN] (a INT, b DECIMAL(10,2))
            // — split on commas at group depth only (type-arg parens nest)
            val groups = Vector.newBuilder[Vector[Int]]
            var cur2 = Vector.newBuilder[Int]
            var d = 1
            idxs.drop(base + 1).foreach { i =>
              toks(i) match {
                case "(" => d += 1; cur2 += i
                case ")" =>
                  d -= 1
                  if (d == 0) { groups += cur2.result(); cur2 = Vector.newBuilder[Int] }
                  else cur2 += i
                case "," if d == 1 =>
                  groups += cur2.result(); cur2 = Vector.newBuilder[Int]
                case _ => if (d >= 1) cur2 += i
              }
            }
            groups.result().filter(_.nonEmpty).map { g =>
              val name = toks(g.head).toLowerCase
              val (tpe, _) = parseTypeAt(toks, kw, g.drop(1))
              AddColumn(ColumnDef(name, tpe), first = false, after = None)
            }
          } else {
            val name = tok(base).toLowerCase
            val (tpe, rest) = parseTypeAt(toks, kw, idxs.drop(base + 1))
            val (first, after) = positionOf(rest)
            Seq(AddColumn(ColumnDef(name, tpe), first, after))
          }
        case "drop" =>
          // MariaDB-flavor IF EXISTS: skip so `if` is never read as a
          // column name
          def past(at: Int): Int =
            if (word(at) == "if" && word(at + 1) == "exists") at + 2 else at
          if (word(1) == "primary" && word(2) == "key") Seq(DropPrimaryKey)
          else if (word(1) == "column")
            Seq(DropColumn(tok(past(2)).toLowerCase))
          else if (Set("index", "key", "constraint", "foreign", "partition",
              "check").contains(word(1))) Seq(IgnoredAction)
          else if (word(1) == "system" && word(2) == "versioning")
            Seq(IgnoredAction) // MariaDB DROP SYSTEM VERSIONING
          else if (word(1) == "period" && word(2) == "for")
            Seq(IgnoredAction) // MariaDB DROP PERIOD FOR SYSTEM_TIME
          else Seq(DropColumn(tok(past(1)).toLowerCase))
        case "modify" =>
          // MariaDB-flavor IF EXISTS on MODIFY/CHANGE: skip it or the
          // keyword reads as the column name
          val base0 = if (word(1) == "column") 2 else 1
          val base = if (word(base0) == "if" && word(base0 + 1) == "exists")
            base0 + 2 else base0
          val name = tok(base).toLowerCase
          val (tpe, rest) = parseTypeAt(toks, kw, idxs.drop(base + 1))
          val (first, after) = positionOf(rest)
          Seq(ModifyColumn(ColumnDef(name, tpe), first, after))
        case "change" =>
          val base0 = if (word(1) == "column") 2 else 1
          val base = if (word(base0) == "if" && word(base0 + 1) == "exists")
            base0 + 2 else base0
          val oldName = tok(base).toLowerCase
          val newName = tok(base + 1).toLowerCase
          val (tpe, rest) = parseTypeAt(toks, kw, idxs.drop(base + 2))
          val (first, after) = positionOf(rest)
          Seq(ChangeColumn(oldName, ColumnDef(newName, tpe), first, after))
        case "rename" =>
          if (word(1) == "column")
            Seq(RenameColumn(tok(2).toLowerCase, tok(4).toLowerCase))
          else if ((word(1) == "index" || word(1) == "key") &&
              word(3) == "to")
            // RENAME INDEX old TO new — no schema effect, and must NOT
            // fall through to RenameTo (it would read as a table rename
            // to a table literally named `index`). The `word(3) == "to"`
            // shape check keeps a genuine table rename to a backticked
            // table NAMED `index`/`key` (2 tokens, no TO tail) on the
            // RenameTo path below.
            Seq(IgnoredAction)
          else {
            val base = if (word(1) == "to" || word(1) == "as") 2 else 1
            if (idxs.length > base + 1 && tok(base + 1) == ".")
              Seq(RenameTo(Some(tok(base).toLowerCase), tok(base + 2).toLowerCase))
            else Seq(RenameTo(None, tok(base).toLowerCase))
          }
        case _ => Seq(IgnoredAction) // ENGINE=, CHARSET=, ALGORITHM=, partition ops
      }
    }
  }

  // ---- fold ----

  /** Apply one ALTER action to a table state. Unknown/ignored actions and
    * references to missing columns are no-ops (log-and-continue semantics). */
  private def applyAction(st: TableState, a: AlterAction): TableState = a match {
    case AddColumn(c, first, after) =>
      if (st.columns.exists(_.name == c.name)) st
      else st.copy(columns = insertAt(st.columns, c, first, after))
    case DropColumn(n) =>
      st.copy(columns = st.columns.filterNot(_.name == n),
        pk = st.pk.filterNot(_ == n))
    case ModifyColumn(c, first, after) =>
      val without = st.columns.filterNot(_.name == c.name)
      if (without.length == st.columns.length) st // unknown column
      else if (!first && after.isEmpty)
        st.copy(columns = st.columns.map(x => if (x.name == c.name) c else x))
      else st.copy(columns = insertAt(without, c, first, after))
    case ChangeColumn(oldN, c, first, after) =>
      if (!st.columns.exists(_.name == oldN)) st
      else {
        val renamedPk = st.pk.map(p => if (p == oldN) c.name else p)
        if (!first && after.isEmpty)
          st.copy(columns = st.columns.map(x => if (x.name == oldN) c else x),
            pk = renamedPk)
        else st.copy(
          columns = insertAt(st.columns.filterNot(_.name == oldN), c, first, after),
          pk = renamedPk)
      }
    case RenameColumn(oldN, newN) =>
      st.copy(
        columns = st.columns.map(x =>
          if (x.name == oldN) x.copy(name = newN) else x),
        pk = st.pk.map(p => if (p == oldN) newN else p))
    case AddPrimaryKey(cols) => st.copy(pk = cols)
    case DropPrimaryKey => st.copy(pk = Vector.empty)
    case _: RenameTo | IgnoredAction => st
  }

  private def insertAt(cols: Vector[ColumnDef], c: ColumnDef, first: Boolean,
      after: Option[String]): Vector[ColumnDef] =
    if (first) c +: cols
    else after match {
      case Some(a) =>
        val i = cols.indexWhere(_.name == a)
        if (i < 0) cols :+ c else (cols.take(i + 1) :+ c) ++ cols.drop(i + 1)
      case None => cols :+ c
    }

  /** Fold a sorted DDL history (one default schema for every statement)
    * into catalog version rows — see foldHistory. */
  def foldSchema(defaultSchema: String,
      history: Seq[(Long, String)],
      base: Map[(String, String), TableState] = Map.empty)
      : Seq[(Long, String, String, String, String)] =
    foldHistory(history.map { case (tso, ddl) => (tso, defaultSchema, ddl) },
      base)

  /** Fold a sorted DDL history into catalog version rows; each statement
    * carries the default schema of the session that ISSUED it (used only
    * to resolve unqualified names — a qualified `ALTER TABLE app.t` folds
    * against app.t whatever the issuing session's default was).
    * Emits one row per (statement, affected table): (tso, schemaName,
    * tableName, schemaJson, colNames); DROP TABLE emits null schemaJson so
    * as-of resolution yields no schema past the drop. */
  def foldHistory(history: Seq[(Long, String, String)],
      base: Map[(String, String), TableState] = Map.empty)
      : Seq[(Long, String, String, String, String)] =
    foldCore(history, base)._1

  /** The END state of a fold — the catalog after replaying `history`
    * over `base` (version rows discarded). Used by consistency checks
    * that compare two histories' final catalogs (e.g. physical DDL vs
    * its logical conversion). */
  def foldState(history: Seq[(Long, String, String)],
      base: Map[(String, String), TableState] = Map.empty)
      : Map[(String, String), TableState] =
    foldCore(history, base)._2

  private def foldCore(history: Seq[(Long, String, String)],
      base: Map[(String, String), TableState])
      : (Seq[(Long, String, String, String, String)],
         Map[(String, String), TableState]) = {
    val tables = mutable.LinkedHashMap[(String, String), TableState]()
    tables ++= base
    val out = Seq.newBuilder[(Long, String, String, String, String)]
    def emit(tso: Long, key: (String, String)): Unit = {
      val st = tables.get(key)
      out += ((tso, key._1, key._2,
        st.map(_.json).orNull, st.map(_.colNames).orNull))
    }
    history.sortBy(_._1).foreach { case (tso, defaultSchema, ddl) =>
      parse(ddl, defaultSchema) match {
        case CreateTable(s, t, cols, pk, ifNotExists) =>
          val key = (s, t)
          if (!(ifNotExists && tables.contains(key))) {
            tables(key) = TableState(cols, pk)
            emit(tso, key)
          }
        case CreateTableLike(s, t, ss, st, ifNotExists) =>
          val key = (s, t)
          if (!(ifNotExists && tables.contains(key)))
            // unknown source: log-and-continue (the reference's
            // ignoreApplyError path), no phantom empty schema
            tables.get((ss, st)).foreach { src =>
              tables(key) = src
              emit(tso, key)
            }
        case CreateTableAsSelect(s, t, ss, st, cols, ifNotExists) =>
          val key = (s, t)
          if (!(ifNotExists && tables.contains(key)))
            tables.get((ss, st)).foreach { src =>
              val projected = cols match {
                case None => src.columns
                case Some(items) => // selected order; unknown refs skipped
                  items.flatMap {
                    case (out, Some(srcName)) =>
                      src.columns.find(_.name == srcName)
                        .map(c => c.copy(name = out))
                    case (out, None) => // aliased expression: the result
                      // set defines its type server-side; log-side it is
                      // a named column of unknown type
                      Some(ColumnDef(out, "unknown"))
                  }.toVector
              }
              if (projected.nonEmpty) {
                tables(key) = TableState(projected, Vector.empty) // CTAS: no keys
                emit(tso, key)
              }
            }
        case DropTable(tabs) =>
          tabs.foreach { case (s, t) =>
            if (tables.remove((s, t)).isDefined) emit(tso, (s, t))
          }
        case DropSchema(s) =>
          val dropped = tables.keys.filter(_._1 == s).toVector
          dropped.foreach { k => tables.remove(k); emit(tso, k) }
        case RenameTable(pairs) =>
          pairs.foreach { case (from, to) =>
            tables.remove(from).foreach { st =>
              emit(tso, from)
              tables(to) = st
              emit(tso, to)
            }
          }
        case AlterTable(s, t, actions) =>
          val key = (s, t)
          tables.get(key).foreach { st0 =>
            // RENAME TO inside ALTER moves the state to a new key
            val renameTo = actions.collectFirst { case RenameTo(rs, rt) =>
              (rs.getOrElse(s), rt)
            }
            val st1 = actions.foldLeft(st0)(applyAction)
            renameTo match {
              case Some(newKey) if newKey != key =>
                tables.remove(key)
                emit(tso, key)
                tables(newKey) = st1
                emit(tso, newKey)
              case _ =>
                if (st1 != st0) { tables(key) = st1; emit(tso, key) }
            }
          }
        case Noop => // no schema effect
      }
    }
    (out.result(), tables.toMap)
  }

  /** Schemas a parsed statement can affect — its fold routing key(s). */
  private[operators] def targetSchemas(stmt: Stmt): Seq[String] = stmt match {
    case CreateTable(s, _, _, _, _) => Seq(s)
    case CreateTableLike(s, _, ss, _, _) => Seq(s, ss).distinct
    case CreateTableAsSelect(s, _, ss, _, _, _) => Seq(s, ss).distinct
    case DropTable(tabs) => tabs.map(_._1).distinct
    case DropSchema(s) => Seq(s)
    case RenameTable(pairs) =>
      pairs.flatMap { case ((s1, _), (s2, _)) => Seq(s1, s2) }.distinct
    case AlterTable(s, _, actions) =>
      (s +: actions.collect { case RenameTo(Some(rs), _) => rs }).distinct
    case Noop => Seq.empty
  }

  /** Union-find over cross-schema edges → representative per schema.
    * Statements spanning two schemas (RENAME TABLE a.x TO b.y) force both
    * schemas' histories into one sequential fold group; everything else
    * keeps its own group. The edge set is tiny (distinct schema pairs in
    * the DDL log), so this is driver-side. */
  private def componentsOf(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Internal routed row: (tso, sessionDefault, ddl, primary target). */
  private def routeByTarget(ddlLog: DataFrame, tsoCol: String,
      schemaCol: String, ddlCol: String)
      : (org.apache.spark.sql.Dataset[(Long, String, String, String)],
         Map[String, String]) = {
    val spark = ddlLog.sparkSession
    import spark.implicits._
    // route each statement by its PARSED target schema — an
    // `ALTER TABLE app.t` issued under session default 'other' must fold
    // where app.t's state lives; the session default is only the
    // unqualified-name fallback (the reference keeps ONE repository and
    // applies every DDL regardless of session default,
    // MemoryTableMeta.java:122-147). Parsing here is a cheap per-row
    // pre-pass; the fold re-parses inside its group.
    val routed = ddlLog
      .select(col(tsoCol).cast("long"), col(schemaCol).cast("string"),
        col(ddlCol).cast("string"))
      .as[(Long, String, String)]
      .map { case (tso, default, ddl) =>
        val targets = targetSchemas(parse(ddl, default))
        (tso, default, ddl, targets.headOption.getOrElse(default))
      }
    val edges = ddlLog
      .select(col(tsoCol).cast("long"), col(schemaCol).cast("string"),
        col(ddlCol).cast("string"))
      .as[(Long, String, String)]
      .flatMap { case (_, default, ddl) =>
        val ts = targetSchemas(parse(ddl, default))
        if (ts.length > 1) ts.combinations(2).map(p => (p(0), p(1))).toSeq
        else Nil
      }.distinct().collect().toSeq
    (routed, componentsOf(edges))
  }

  /** Fold a raw DDL-text log DataFrame (tsoCol, schemaCol = default schema
    * of the session that issued the DDL, ddlCol = statement text) into
    * SchemaCatalog-compatible version rows: (tso, schemaName, tableName,
    * schemaJson, colNames).
    *
    * Distribution: grouped by the statement's parsed TARGET schema
    * (cross-schema statements union their schemas into one group), so DDL
    * for one logical database replays in order on one executor — bounded
    * state, the MemoryTableMeta assumption — and schemas fold in
    * parallel. */
  def foldDdlLog(ddlLog: DataFrame, tsoCol: String = "tso",
      schemaCol: String = "schemaName", ddlCol: String = "ddl"): DataFrame = {
    val spark = ddlLog.sparkSession
    import spark.implicits._
    val (routed, comp) = routeByTarget(ddlLog, tsoCol, schemaCol, ddlCol)
    routed
      .groupByKey { case (_, _, _, primary) => comp.getOrElse(primary, primary) }
      .flatMapGroups { (_, it) =>
        foldHistory(it.map(r => (r._1, r._2, r._3)).toSeq).iterator
      }
      .toDF("tso", "schemaName", "tableName", "schemaJson", "colNames")
  }

  /** Snapshot-bootstrapped fold — the restart path (the reference's
    * RollbackMode.SNAPSHOT_EXACTLY: build meta from the latest snapshot ≤
    * the start position, then replay only the DDL since,
    * meta/.../RollbackMode.java + PolarDbXTableMetaManager.rollback).
    * At a 100 TB history this replays hours of DDL, not years.
    *
    * `snapshot` rows: (schemaName, tableName, schemaJson) as written by
    * this catalog (snapshotAt output shape). Emits the snapshot state as
    * version rows at `snapTso`, then folds DDL rows with tso > snapTso on
    * top of it — per schema in parallel via cogroup. */
  def foldDdlLogFrom(snapshot: DataFrame, snapTso: Long, ddlLog: DataFrame,
      tsoCol: String = "tso", schemaCol: String = "schemaName",
      tableCol: String = "tableName", jsonCol: String = "schemaJson",
      ddlCol: String = "ddl"): DataFrame = {
    val spark = ddlLog.sparkSession
    import spark.implicits._
    val since = ddlLog.filter(col(tsoCol) > snapTso)
    val (routed, comp) = routeByTarget(since, tsoCol, schemaCol, ddlCol)
    val snap = snapshot
      .select(col(schemaCol).cast("string"), col(tableCol).cast("string"),
        col(jsonCol).cast("string"))
      .as[(String, String, String)]
      .groupByKey(r => comp.getOrElse(r._1.toLowerCase, r._1.toLowerCase))
    val ddl = routed
      .groupByKey { case (_, _, _, primary) => comp.getOrElse(primary, primary) }
    snap.cogroup(ddl) { (_, snapIt, ddlIt) =>
      val base = snapIt
        .map(r => (r._1.toLowerCase, r._2.toLowerCase) ->
          TableState.fromJson(r._3))
        .toMap
      val baseRows = base.iterator.map { case ((s, t), st) =>
        (snapTso, s, t, st.json, st.colNames)
      }
      baseRows ++ foldHistory(
        ddlIt.map(r => (r._1, r._2, r._3)).toSeq, base).iterator
    }.toDF("tso", "schemaName", "tableName", "schemaJson", "colNames")
  }
}
