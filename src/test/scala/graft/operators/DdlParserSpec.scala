package graft.operators

import graft.SparkSpec
import graft.operators.DdlParser._

class DdlParserSpec extends SparkSpec {
  import spark.implicits._

  // ---- parse ----

  test("CREATE TABLE: columns, types, table-level PK, backticks, flags") {
    val s = parse(
      """CREATE TABLE `app`.`users` (
        |  `id` BIGINT UNSIGNED NOT NULL AUTO_INCREMENT,
        |  name VARCHAR(64) DEFAULT 'anon' COMMENT 'display, name',
        |  balance DECIMAL(10,2),
        |  flag TINYINT(1),
        |  created DATETIME,
        |  PRIMARY KEY (id),
        |  KEY idx_name (name)
        |)""".stripMargin, "dflt")
    assert(s == CreateTable("app", "users", Vector(
      ColumnDef("id", "decimal(20,0)"), ColumnDef("name", "string"),
      ColumnDef("balance", "decimal(10,2)"), ColumnDef("flag", "boolean"),
      ColumnDef("created", "timestamp")), Vector("id"), ifNotExists = false))
  }

  test("CREATE TABLE: inline PRIMARY KEY, default schema, IF NOT EXISTS") {
    val s = parse(
      "create table if not exists t (a int primary key, b text)", "db1")
    assert(s == CreateTable("db1", "t",
      Vector(ColumnDef("a", "int"), ColumnDef("b", "string")),
      Vector("a"), ifNotExists = true))
  }

  test("ALTER TABLE: multi-action add/drop/modify/change with positions") {
    val s = parse(
      "ALTER TABLE app.t ADD COLUMN c1 INT AFTER a, DROP COLUMN b, " +
        "MODIFY c2 BIGINT, CHANGE COLUMN old_c new_c VARCHAR(10) FIRST, " +
        "ADD INDEX idx (c1)", "x")
    assert(s == AlterTable("app", "t", Seq(
      AddColumn(ColumnDef("c1", "int"), first = false, after = Some("a")),
      DropColumn("b"),
      ModifyColumn(ColumnDef("c2", "bigint"), first = false, after = None),
      ChangeColumn("old_c", ColumnDef("new_c", "string"), first = true, after = None),
      IgnoredAction)))
  }

  test("ALTER TABLE: paren-group ADD COLUMN (a, b) with nested type parens") {
    val s = parse(
      "ALTER TABLE t ADD COLUMN (a INT, b DECIMAL(10,2), c VARCHAR(8))", "s")
    assert(s == AlterTable("s", "t", Seq(
      AddColumn(ColumnDef("a", "int"), first = false, after = None),
      AddColumn(ColumnDef("b", "decimal(10,2)"), first = false, after = None),
      AddColumn(ColumnDef("c", "string"), first = false, after = None))))
    // and the fold applies all three
    val out = foldSchema("s", Seq(
      (1L, "CREATE TABLE t (id BIGINT)"),
      (2L, "ALTER TABLE t ADD (a INT, b DECIMAL(10,2))")))
    assert(out.last._5 == "id,a,b")
  }

  test("ALTER TABLE: rename-to, rename column, pk add/drop") {
    assert(parse("ALTER TABLE t RENAME TO t2", "s") ==
      AlterTable("s", "t", Seq(RenameTo(None, "t2"))))
    assert(parse("ALTER TABLE t RENAME COLUMN a TO b", "s") ==
      AlterTable("s", "t", Seq(RenameColumn("a", "b"))))
    assert(parse("ALTER TABLE t ADD PRIMARY KEY (a, b)", "s") ==
      AlterTable("s", "t", Seq(AddPrimaryKey(Vector("a", "b")))))
    assert(parse("ALTER TABLE t DROP PRIMARY KEY", "s") ==
      AlterTable("s", "t", Seq(DropPrimaryKey)))
  }

  test("pk column capture stops at the paren list; index options never leak") {
    assert(parse("ALTER TABLE t ADD PRIMARY KEY (a) USING BTREE", "s") ==
      AlterTable("s", "t", Seq(AddPrimaryKey(Vector("a")))))
    // index-prefix lengths and ASC/DESC are not key columns
    assert(parse("ALTER TABLE t ADD PRIMARY KEY (name(10), id DESC)", "s") ==
      AlterTable("s", "t", Seq(AddPrimaryKey(Vector("name", "id")))))
    assert(parse(
      "CREATE TABLE t (a INT, b INT, PRIMARY KEY (a(4), b) USING HASH)", "s") ==
      CreateTable("s", "t",
        Vector(ColumnDef("a", "int"), ColumnDef("b", "int")),
        Vector("a", "b"), ifNotExists = false))
  }

  test("dialect noise digests without schema effect") {
    // column charset/collation/comment; table options incl. partition
    val c = parse("CREATE TABLE t (a VARCHAR(20) CHARACTER SET utf8mb4 " +
      "COLLATE utf8mb4_bin COMMENT 'x, (y)', b INT) ENGINE=InnoDB " +
      "DEFAULT CHARSET=utf8mb4 PARTITION BY HASH(b) PARTITIONS 4", "s")
    assert(c == CreateTable("s", "t",
      Vector(ColumnDef("a", "string"), ColumnDef("b", "int")),
      Vector.empty, ifNotExists = false))
    // online-DDL clauses parse as ignored actions, not Noop statements
    assert(parse("ALTER TABLE t ADD COLUMN c INT, ALGORITHM=INPLACE, LOCK=NONE", "s") ==
      AlterTable("s", "t", Seq(
        AddColumn(ColumnDef("c", "int"), first = false, after = None),
        IgnoredAction, IgnoredAction)))
    assert(parse("ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4", "s") ==
      AlterTable("s", "t", Seq(IgnoredAction)))
    // generated column keeps its name and type
    assert(parse("ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (a+b) STORED", "s") ==
      AlterTable("s", "t", Seq(
        AddColumn(ColumnDef("g", "int"), first = false, after = None))))
  }

  test("DROP / RENAME TABLE / TRUNCATE / noise statements") {
    assert(parse("DROP TABLE IF EXISTS app.t", "s") == DropTable("app", "t"))
    // multi-table drop, mixed qualification, trailing RESTRICT ignored
    assert(parse("DROP TABLE a, app.b, c RESTRICT", "s") ==
      DropTable(Seq(("s", "a"), ("app", "b"), ("s", "c"))))
    assert(parse("RENAME TABLE a TO b, s2.c TO s3.d", "s1") ==
      RenameTable(Seq((("s1", "a"), ("s1", "b")), (("s2", "c"), ("s3", "d")))))
    assert(parse("TRUNCATE TABLE t", "s") == Noop)
    assert(parse("FLUSH PRIVILEGES", "s") == Noop)
    assert(parse("CREATE INDEX i ON t (a)", "s") == Noop)
    assert(parse("-- just a comment", "s") == Noop)
    assert(parse("not even sql (", "s") == Noop)
    // a paren later in the statement is not a column body
    assert(parse("CREATE TABLE t2 AS SELECT f(x) FROM t", "s") == Noop)
    // LIKE is supported (schema clone), not a Noop
    assert(parse("CREATE TABLE t2 LIKE t", "s") ==
      CreateTableLike("s", "t2", "s", "t", ifNotExists = false))
  }

  test("type normalization covers the MySQL families") {
    assert(normalizeType("INT", Nil) == "int")
    assert(normalizeType("tinyint", Seq("1")) == "boolean")
    assert(normalizeType("tinyint", Seq("4")) == "tinyint")
    assert(normalizeType("ENUM", Seq("'a'", "'b'")) == "string")
    assert(normalizeType("NUMERIC", Seq("12", "4")) == "decimal(12,4)")
    assert(normalizeType("longblob", Nil) == "binary")
    assert(normalizeType("datetime", Nil) == "timestamp")
  }

  // ---- fold ----

  test("foldSchema: create → add → drop → change column lifecycle") {
    val hist = Seq(
      (1L, "CREATE TABLE t (a BIGINT PRIMARY KEY, b DOUBLE)"),
      (2L, "ALTER TABLE t ADD COLUMN c VARCHAR(8) AFTER a"),
      (3L, "ALTER TABLE t DROP COLUMN b"),
      (4L, "ALTER TABLE t CHANGE COLUMN c c2 TEXT"))
    val out = foldSchema("s", hist).map(r => (r._1, r._5))
    assert(out == Seq(
      (1L, "a,b"), (2L, "a,c,b"), (3L, "a,c"), (4L, "a,c2")))
  }

  test("foldSchema: rename table moves state; drop emits null version") {
    val hist = Seq(
      (1L, "CREATE TABLE t (a INT)"),
      (2L, "RENAME TABLE t TO t2"),
      (3L, "ALTER TABLE t2 ADD COLUMN b INT"),
      (4L, "DROP TABLE t2"))
    val out = foldSchema("s", hist)
    assert(out.map(r => (r._1, r._3, r._5)) == Seq(
      (1L, "t", "a"),
      (2L, "t", null), (2L, "t2", "a"),
      (3L, "t2", "a,b"),
      (4L, "t2", null)))
  }

  test("CREATE TABLE LIKE clones the source schema (both syntaxes)") {
    val hist = Seq(
      (1L, "CREATE TABLE src (id BIGINT PRIMARY KEY, v DOUBLE)"),
      (2L, "CREATE TABLE c1 LIKE src"),
      (3L, "CREATE TABLE c2 (LIKE src)"),
      // the clone is a COPY: evolving it must not touch the source
      (4L, "ALTER TABLE c1 ADD COLUMN note TEXT"),
      // IF NOT EXISTS against an existing table: no clobber
      (5L, "CREATE TABLE IF NOT EXISTS c1 LIKE src"),
      // unknown source: log-and-continue, no phantom schema
      (6L, "CREATE TABLE c3 LIKE ghost"))
    val out = foldSchema("s", hist).map(r => (r._1, r._3, r._5))
    assert(out == Seq(
      (1L, "src", "id,v"),
      (2L, "c1", "id,v"),
      (3L, "c2", "id,v"),
      (4L, "c1", "id,v,note")))
    // cross-schema LIKE routes both schemas into one fold group
    assert(DdlParser.targetSchemas(
      DdlParser.parse("CREATE TABLE a.copy LIKE b.orig", "s")) ==
      Seq("a", "b"))
    // a REAL column body whose first column is named `like` is a body,
    // not a clone — the paren form must be exactly "(LIKE name)"
    assert(parse("CREATE TABLE t (`like` INT, id INT)", "s") ==
      CreateTable("s", "t",
        Vector(ColumnDef("like", "int"), ColumnDef("id", "int")),
        Vector.empty, ifNotExists = false))
  }

  test("CREATE TABLE AS SELECT: bare projections clone, expressions stay Noop") {
    val hist = Seq(
      (1L, "CREATE TABLE src (id BIGINT PRIMARY KEY, a INT, b TEXT)"),
      (2L, "CREATE TABLE c1 AS SELECT * FROM src"),
      (3L, "CREATE TABLE c2 AS SELECT b, id FROM src"),
      (4L, "CREATE TABLE c3 SELECT a FROM src"), // AS is optional in MySQL
      (5L, "CREATE TABLE c4 AS SELECT f(a) FROM src"), // expression → Noop
      (6L, "CREATE TABLE c5 AS SELECT ghost FROM src")) // no known cols
    val out = foldSchema("s", hist).map(r => (r._1, r._3, r._5))
    assert(out == Seq(
      (1L, "src", "id,a,b"),
      (2L, "c1", "id,a,b"),
      (3L, "c2", "b,id"),   // selected order, not source order
      (4L, "c3", "a")))
    // CTAS does not copy keys (MySQL semantics): the clone has no pk
    val parsed = DdlParser.parse("CREATE TABLE c2 AS SELECT b, id FROM src", "s")
    assert(parsed == CreateTableAsSelect("s", "c2", "s", "src",
      Some(Seq(("b", Some("b")), ("id", Some("id")))), ifNotExists = false))
    // qualified source + cross-schema fold routing
    assert(DdlParser.targetSchemas(
      DdlParser.parse("CREATE TABLE a.c AS SELECT * FROM b.src", "s")) ==
      Seq("a", "b"))
  }

  test("CTAS aliased expressions: alias names the column, type from source when derivable") {
    val hist = Seq(
      (1L, "CREATE TABLE src (id BIGINT PRIMARY KEY, a INT, b TEXT)"),
      // aliased single column: new name, b's type travels with it
      (2L, "CREATE TABLE c1 AS SELECT b AS label, id FROM src"),
      // aliased expressions: named columns; the server derives their
      // types from the result set, log-side they are "unknown"
      (3L, "CREATE TABLE c2 AS SELECT count(a) AS n, concat(a, b) AS ab FROM src"),
      // CAST's inner AS sits in parens — the top-level alias still wins
      (4L, "CREATE TABLE c3 AS SELECT CAST(id AS UNSIGNED) AS uid FROM src"),
      // unaliased expression: no derivable NAME → whole statement Noop
      (5L, "CREATE TABLE c4 AS SELECT f(a), b FROM src"))
    val out = foldSchema("s", hist).map(r => (r._1, r._3, r._5))
    assert(out == Seq(
      (1L, "src", "id,a,b"),
      (2L, "c1", "label,id"),
      (3L, "c2", "n,ab"),
      (4L, "c3", "uid")))
    // the aliased clone CARRIES the source type; expressions are unknown
    val parsed = DdlParser.parse(
      "CREATE TABLE c2 AS SELECT count(a) AS n, b AS label FROM src", "s")
    assert(parsed == CreateTableAsSelect("s", "c2", "s", "src",
      Some(Seq(("n", None), ("label", Some("b")))), ifNotExists = false))
  }

  test("foldSchema: pk follows CHANGE rename; unknown refs are no-ops") {
    val hist = Seq(
      (1L, "CREATE TABLE t (a INT PRIMARY KEY, b INT)"),
      (2L, "ALTER TABLE t CHANGE a a2 BIGINT"),
      (3L, "ALTER TABLE t DROP COLUMN nope"),     // unknown column: no-op
      (4L, "ALTER TABLE missing ADD COLUMN x INT")) // unknown table: no-op
    val out = foldSchema("s", hist)
    assert(out.length == 2)
    assert(out.last._4 ==
      """{"columns":[{"name":"a2","type":"bigint"},{"name":"b","type":"int"}],"pk":["a2"]}""")
  }

  test("foldSchema: IF NOT EXISTS does not clobber an existing table") {
    val hist = Seq(
      (1L, "CREATE TABLE t (a INT)"),
      (2L, "ALTER TABLE t ADD COLUMN b INT"),
      (3L, "CREATE TABLE IF NOT EXISTS t (z INT)"))
    val out = foldSchema("s", hist)
    assert(out.map(_._5) == Seq("a", "a,b")) // tso=3 emits nothing
  }

  test("operational-DDL breadth: partitions, charsets, generated cols, defaults") {
    // the DruidDdlParser coverage set a real DDL log eventually contains
    // (reference canal/core/ddl/parser/DruidDdlParser.java): partition
    // clauses and maintenance, per-column charset/collation, generated
    // columns, default changes, index renames — schema-relevant parts
    // fold; the rest must be digested WITHOUT rejecting the statement
    val hist = Seq(
      (1L, "CREATE TABLE t (id BIGINT PRIMARY KEY, v VARCHAR(10) " +
        "CHARACTER SET latin1 COLLATE latin1_bin NOT NULL, " +
        "g INT GENERATED ALWAYS AS (id + 1) STORED) " +
        "PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10), " +
        "PARTITION p1 VALUES LESS THAN MAXVALUE)"),
      (2L, "ALTER TABLE t ADD PARTITION (PARTITION p2 VALUES LESS THAN (30))"),
      (3L, "ALTER TABLE t ALTER COLUMN v SET DEFAULT 'x'"),
      (4L, "ALTER TABLE t ALTER v DROP DEFAULT"),
      (5L, "ALTER TABLE t RENAME INDEX i1 TO i2"), // NOT a table rename
      (6L, "ALTER TABLE t MODIFY v VARCHAR(64) CHARACTER SET utf8mb4 " +
        "COLLATE utf8mb4_bin"),
      (7L, "ALTER TABLE t ADD COLUMN g2 INT GENERATED ALWAYS AS (id * 2) " +
        "VIRTUAL AFTER id"),
      (8L, "ALTER TABLE t REORGANIZE PARTITION p0 INTO " +
        "(PARTITION p3 VALUES LESS THAN (5))"),
      (9L, "ALTER TABLE t REMOVE PARTITIONING"),
      (10L, "ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4"))
    val out = foldSchema("s", hist)
    // only the CREATE and the one real column add change the schema;
    // the table NAME survives every partition/index/default statement
    assert(out.map(r => (r._1, r._3)) == Seq((1L, "t"), (7L, "t")))
    // but a table rename TO a backticked table literally named `index`
    // or `key` is still a real rename (no TO tail after the keyword)
    assert(parse("ALTER TABLE t RENAME `index`", "s") ==
      AlterTable("s", "t", Seq(RenameTo(None, "index"))))
    assert(parse("ALTER TABLE t RENAME TO `key`", "s") ==
      AlterTable("s", "t", Seq(RenameTo(None, "key"))))
    assert(parse("ALTER TABLE t RENAME KEY a TO b", "s") ==
      AlterTable("s", "t", Seq(IgnoredAction)))
    assert(out.last._5 == "id,g2,v,g")
    assert(out.last._4.contains(""""pk":["id"]"""))
    // generated columns keep name + base type
    assert(out.last._4.contains(""""name":"g","type":"int""""))
    assert(out.last._4.contains(""""name":"g2","type":"int""""))
  }

  test("TableState.fromJson round-trips the catalog's own json") {
    val st = TableState(Vector(ColumnDef("id", "bigint"),
      ColumnDef("v", "decimal(10,2)")), Vector("id"))
    assert(TableState.fromJson(st.json) == st)
    assert(TableState.fromJson(
      TableState(Vector.empty, Vector.empty).json) ==
      TableState(Vector.empty, Vector.empty))
  }

  test("foldSchema with a snapshot base replays only the delta") {
    val base = Map(("s", "t") ->
      TableState(Vector(ColumnDef("a", "int")), Vector.empty))
    val out = foldSchema("s",
      Seq((10L, "ALTER TABLE t ADD COLUMN b BIGINT")), base)
    assert(out == Seq((10L, "s", "t",
      """{"columns":[{"name":"a","type":"int"},{"name":"b","type":"bigint"}],"pk":[]}""",
      "a,b")))
  }

  test("resolveFromSnapshot: snapshot + DDL-since restart path") {
    val snapshot = Seq(
      ("app", "t1", """{"columns":[{"name":"id","type":"bigint"}],"pk":["id"]}"""))
      .toDF("schemaName", "tableName", "schemaJson")
    val ddlSince = Seq(
      (50L, "app", "ALTER TABLE t1 ADD COLUMN v DOUBLE"), // after snapshot
      (5L, "app", "ALTER TABLE t1 ADD COLUMN ignored INT"), // BEFORE: excluded
      (80L, "app", "CREATE TABLE t2 (x INT)"))
      .toDF("tso", "schemaName", "ddl")
    val events = Seq(
      (20L, "app", "t1"), (60L, "app", "t1"), (90L, "app", "t2"),
      (5L, "app", "t1")) // precedes the bootstrap horizon
      .toDF("tso", "schemaName", "tableName")
    val got = SchemaCatalog.resolveFromSnapshot(events, snapshot, 10L, ddlSince)
      .select("tso", "colNames").as[(Long, Option[String])].collect().toMap
    assert(got(20L).contains("id"))       // snapshot state
    assert(got(60L).contains("id,v"))     // snapshot + replayed ALTER
    assert(got(90L).contains("x"))        // table created after snapshot
    assert(got(5L).isEmpty)               // before the bootstrap horizon
  }

  test("physical DDL normalizes then folds (DDLConverter → MemoryTableMeta)") {
    import org.apache.spark.sql.functions.col
    // physical-shard DDL (suffixed table names) → logical DDL → fold:
    // the reference's DDLConverter feeds SchemaRepository the same way
    val physical = Seq(
      (1L, "app", "CREATE TABLE `orders_00001` (id BIGINT, v DOUBLE)"),
      (2L, "app", "ALTER TABLE orders_00001 ADD COLUMN note TEXT"))
      .toDF("tso", "schemaName", "ddl")
    val logical = physical.withColumn("ddl",
      Reshape.normalizeDdl(col("ddl")))
    val folded = DdlParser.foldDdlLog(logical)
      .select("tso", "tableName", "colNames")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(folded.toSeq == Seq(
      (1L, "orders", "id,v"), (2L, "orders", "id,v,note")))
  }

  test("foldDdlLog routes by parsed target schema, not session default") {
    // ALTER TABLE app.t issued under session default 'other' must fold
    // where app.t's state lives (one repository regardless of session,
    // MemoryTableMeta semantics); a cross-schema RENAME unions its two
    // schemas into one ordered fold group
    val log = Seq(
      (1L, "app", "CREATE TABLE app.t (a INT)"),
      (2L, "other", "ALTER TABLE app.t ADD COLUMN b INT"),
      (3L, "other", "RENAME TABLE app.t TO legacy.t2"),
      (4L, "legacy", "ALTER TABLE t2 ADD COLUMN c INT"))
      .toDF("tso", "schemaName", "ddl")
    val folded = DdlParser.foldDdlLog(log)
      .select("tso", "schemaName", "tableName", "colNames")
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(folded == Set(
      (1L, "app", "t", Some("a")),
      (2L, "app", "t", Some("a,b")), // NOT silently dropped in 'other'
      (3L, "app", "t", None), // moved out
      (3L, "legacy", "t2", Some("a,b")), // moved in, state intact
      (4L, "legacy", "t2", Some("a,b,c"))))
  }

  test("foldDdlLog + resolveDdlText: as-of resolution over raw DDL text") {
    val rawDdl = Seq(
      (10L, "app", "CREATE TABLE events (id BIGINT, v DOUBLE)"),
      (20L, "app", "ALTER TABLE events ADD COLUMN note TEXT"))
      .toDF("tso", "schemaName", "ddl")
    val events = Seq((15L, "app", "events"), (25L, "app", "events"),
      (5L, "app", "events")).toDF("tso", "schemaName", "tableName")
    val got = SchemaCatalog.resolveDdlText(events, rawDdl)
      .select("tso", "colNames").as[(Long, Option[String])].collect().toMap
    assert(got(15L).contains("id,v"))
    assert(got(25L).contains("id,v,note"))
    assert(got(5L).isEmpty)
  }
}
