package graft.jobs

import graft.SparkSpec

/** The flashback SQL ARTIFACT (`FlashbackJob.exportSql`) — the
  * reference recovery job's user-facing output
  * (rpl/applier/RecoveryApplier.java:130-262 flush-to-files,
  * :371-424 reverseSQL): executable statements in reversed commit
  * order, packaged file-per-range. The gate REPLAYS the emitted files
  * through a MySQL-semantics table emulation (REPLACE INTO upsert,
  * DELETE FROM ... WHERE, UPDATE ... SET ... WHERE) and asserts the
  * pre-range state is restored exactly. */
class FlashbackSqlExportSpec extends SparkSpec {
  import spark.implicits._

  private type Row = Map[String, Option[String]]
  private type Table = Map[String, Row] // key value -> row

  // ---- a tiny statement interpreter for OUR emitted dialect ----
  private def unquote(v: String): Option[String] =
    if (v == "NULL") None
    else if (v.startsWith("'")) {
      val body = v.substring(1, v.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        if (body(i) == '\\' && i + 1 < body.length) {
          body(i + 1) match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case c => sb.append(c)
          }
          i += 2
        } else { sb.append(body(i)); i += 1 }
      }
      Some(sb.toString)
    } else Some(v) // bare numeric

  /** Split "a, b, c" at top level (commas inside quotes don't split). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inQ) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s(i + 1)); i += 1 }
        else if (c == '\'') inQ = false
      } else if (c == '\'') { cur.append(c); inQ = true }
      else if (c == sep) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim)
  }

  private def applyStmt(state: Table, stmt: String, key: String): Table = {
    if (stmt.startsWith("REPLACE INTO")) {
      val cols = splitTop(stmt.substring(stmt.indexOf('(') + 1,
        stmt.indexOf(") VALUES (")), ',').map(_.stripPrefix("`")
        .stripSuffix("`"))
      val vals = splitTop(stmt.substring(stmt.indexOf(") VALUES (") + 10,
        stmt.lastIndexOf(");")), ',').map(unquote)
      val row = cols.zip(vals).toMap
      state + (row(key).get -> row)
    } else if (stmt.startsWith("DELETE FROM")) {
      val cond = stmt.substring(stmt.indexOf(" WHERE ") + 7)
        .stripSuffix(";")
      // single-key WHERE in these specs
      val v = unquote(cond.substring(cond.indexOf('=') + 1).trim).get
      state - v
    } else if (stmt.startsWith("UPDATE")) {
      val setPart = stmt.substring(stmt.indexOf(" SET ") + 5,
        stmt.indexOf(" WHERE "))
      val cond = stmt.substring(stmt.indexOf(" WHERE ") + 7)
        .stripSuffix(";")
      val keyVal = unquote(cond.substring(cond.indexOf('=') + 1)
        .trim).get
      val sets = splitTop(setPart, ',').map { a =>
        val at = a.indexOf('=')
        a.substring(0, at).trim.stripPrefix("`").stripSuffix("`") ->
          unquote(a.substring(at + 1).trim)
      }.toMap
      // MySQL UPDATE on a missing key is a no-op; assert it never
      // happens here (the artifact must always hit)
      assert(state.contains(keyVal), s"UPDATE missed key $keyVal")
      state + (keyVal -> (state(keyVal) ++ sets))
    } else sys.error(s"unparsed statement: $stmt")
  }

  test("exportSql: replaying the emitted files restores the pre-range state; files are replay-ordered; escaping round-trips") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-fbsql").toString + "/sql"
    // forward history over bank.accounts (key id): the pre-range state
    // holds ids 1,2,3; the range INSERTs 4 and 5, UPDATEs 1 (note with
    // a quote) and 4 TWICE IN ONE TXN, DELETEs 2
    def img(id: String, seq: String, note: Option[String],
        bal: String): Map[String, String] =
      Map("id" -> id, "seq" -> seq, "balance" -> bal) ++
        note.map("note" -> _)
    val events = Seq(
      // (tso, seq, op, before, after)
      (10L, 1L, "INSERT", Map.empty[String, String],
        img("4", "1", Some("new4"), "5")),
      (11L, 1L, "UPDATE", img("1", "0", Some("x"), "100"),
        img("1", "1", Some("y'z"), "150")),
      (12L, 1L, "DELETE", img("2", "0", Some("b\\c\nd\re"), "200"),
        Map.empty[String, String]),
      (13L, 1L, "UPDATE", img("4", "1", Some("new4"), "5"),
        img("4", "2", Some("new4"), "10")),
      (13L, 2L, "UPDATE", img("4", "2", Some("new4"), "10"),
        img("4", "3", None, "20")),
      (14L, 1L, "INSERT", Map.empty[String, String],
        img("5", "1", Some("e\nf"), "500")))
      .toDF("tso", "seq", "op", "before", "after")
      .withColumn("schemaName", org.apache.spark.sql.functions.lit("bank"))
      .withColumn("tableName",
        org.apache.spark.sql.functions.lit("accounts"))

    val inverted = FlashbackJob.build(events, "tso", 10L, 14L,
      "op", "before", "after", "tableName")
    val n = FlashbackJob.exportSql(inverted,
      Map(("bank", "accounts") -> Seq("id", "seq", "note", "balance")),
      Map(("bank", "accounts") -> Seq("id")),
      out, numFiles = 3,
      numericCols = Map(("bank", "accounts") -> Set("id", "seq",
        "balance")),
      seqCol = Some("seq"))
    assert(n == 6L, s"one statement per DML event, got $n")

    // the artifact: part files in name order, lines in file order
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".txt"))
      .sortBy(_.getName)
    assert(files.length >= 2, "file-per-range packaging expected")
    val stmts = files.toSeq.flatMap(f => scala.io.Source.fromFile(f)
      .getLines().toSeq)
    assert(stmts.size == 6)

    // newest-first: the first statement undoes tso 14 (INSERT id=5 →
    // DELETE), the last undoes tso 10
    assert(stmts.head == "DELETE FROM `bank`.`accounts` WHERE `id` = 5;")
    assert(stmts.last == "DELETE FROM `bank`.`accounts` WHERE `id` = 4;")
    // the DELETE of id 2 restores via REPLACE with escaped quote-free
    // but backslash/newline/carriage-return-bearing note (the \r would
    // otherwise split the line-oriented artifact — the reference's
    // valueWrapper gap)
    assert(stmts.exists(_ ==
      "REPLACE INTO `bank`.`accounts` (`id`, `seq`, `note`, `balance`)" +
        " VALUES (2, 0, 'b\\\\c\\nd\\re', 200);"))

    // REPLAY through the MySQL-semantics emulation: end state → pre state
    val endState: Table = Map(
      "1" -> Map("id" -> Some("1"), "seq" -> Some("1"),
        "note" -> Some("y'z"), "balance" -> Some("150")),
      "3" -> Map("id" -> Some("3"), "seq" -> Some("0"),
        "note" -> Some("c3"), "balance" -> Some("300")),
      "4" -> Map("id" -> Some("4"), "seq" -> Some("3"),
        "note" -> None, "balance" -> Some("20")),
      "5" -> Map("id" -> Some("5"), "seq" -> Some("1"),
        "note" -> Some("e\nf"), "balance" -> Some("500")))
    val preState: Table = Map(
      "1" -> Map("id" -> Some("1"), "seq" -> Some("0"),
        "note" -> Some("x"), "balance" -> Some("100")),
      "2" -> Map("id" -> Some("2"), "seq" -> Some("0"),
        "note" -> Some("b\\c\nd\re"), "balance" -> Some("200")),
      "3" -> Map("id" -> Some("3"), "seq" -> Some("0"),
        "note" -> Some("c3"), "balance" -> Some("300")))
    // statements may span lines? no — one per line by construction
    val replayed = stmts.foldLeft(endState)((st, s) =>
      applyStmt(st, s, "id"))
    assert(replayed == preState,
      s"flashback SQL must restore the pre-range state, got $replayed")

    // the _meta sidecar names the range and count
    val meta = scala.io.Source.fromFile(s"$out/_meta").getLines().toSeq
    assert(meta.contains("statements=6") && meta.contains("fromTso=10")
      && meta.contains("toTso=14"), s"meta: $meta")
  }

  test("exportSql multi-table: one dispatched render covers all tables " +
      "(no per-table passes), interleaved replay order kept") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-fbsql-mt").toString + "/sql"
    val events = Seq(
      (10L, "INSERT", "a", Map.empty[String, String],
        Map("id" -> "1", "v" -> "x")),
      (11L, "INSERT", "b", Map.empty[String, String],
        Map("k" -> "7", "w" -> "y")),
      (12L, "DELETE", "a", Map("id" -> "2", "v" -> "z"),
        Map.empty[String, String]))
      .toDF("tso", "op", "tableName", "before", "after")
      .withColumn("schemaName", org.apache.spark.sql.functions.lit("db"))
    val inverted = FlashbackJob.build(events, "tso", 10L, 12L,
      "op", "before", "after", "tableName")
    val n = FlashbackJob.exportSql(inverted,
      Map(("db", "a") -> Seq("id", "v"), ("db", "b") -> Seq("k", "w")),
      Map(("db", "a") -> Seq("id"), ("db", "b") -> Seq("k")),
      out, numFiles = 1,
      numericCols = Map(("db", "a") -> Set("id"), ("db", "b") -> Set("k")))
    assert(n == 3L)
    val stmts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".txt")).sortBy(_.getName)
      .toSeq.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    // newest-first ACROSS tables: undo tso 12 (a), then 11 (b), then 10 (a)
    assert(stmts == Seq(
      "REPLACE INTO `db`.`a` (`id`, `v`) VALUES (2, 'z');",
      "DELETE FROM `db`.`b` WHERE `k` = 7;",
      "DELETE FROM `db`.`a` WHERE `id` = 1;"), s"got $stmts")
    val meta = scala.io.Source.fromFile(s"$out/_meta").getLines().toSeq
    assert(meta.contains("statements=3") && meta.contains("fromTso=10")
      && meta.contains("toTso=12"), s"meta: $meta")
  }

  test("exportSql refuses unregistered and keyless tables loudly") {
    val ev = Seq((1L, 1L, "INSERT", Map.empty[String, String],
      Map("id" -> "1", "seq" -> "1")))
      .toDF("tso", "seq", "op", "before", "after")
      .withColumn("schemaName", org.apache.spark.sql.functions.lit("s"))
      .withColumn("tableName", org.apache.spark.sql.functions.lit("t"))
    val inv = FlashbackJob.build(ev, "tso", 1L, 1L, "op", "before",
      "after", "tableName")
    val out = java.nio.file.Files
      .createTempDirectory("graft-fbsql-refuse").toString
    intercept[IllegalArgumentException] {
      FlashbackJob.exportSql(inv, Map.empty, Map.empty, s"$out/a")
    }
    intercept[IllegalArgumentException] {
      FlashbackJob.exportSql(inv,
        Map(("s", "t") -> Seq("id", "seq")), Map.empty, s"$out/b")
    }
  }
}
