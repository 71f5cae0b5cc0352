package graft.operators

import graft.SparkSpec

/** Round-trip fuzz for the DDL parser+fold: drive a simple in-memory
  * schema model with random operations, render each operation to MySQL
  * DDL text with randomized formatting (case, backticks, whitespace,
  * noise flags), fold the rendered log through DdlParser, and require the
  * folded final state to equal the model — the qatest/random analog for
  * the MemoryTableMeta path (reference: polardbx-cdc-test DDL suites). */
class DdlFuzzSpec extends SparkSpec {

  private val types = Vector(
    "INT" -> "int", "BIGINT" -> "bigint", "VARCHAR(32)" -> "string",
    "TEXT" -> "string", "DOUBLE" -> "double", "DECIMAL(10,2)" -> "decimal(10,2)",
    "DATETIME" -> "timestamp", "TINYINT(1)" -> "boolean", "BLOB" -> "binary")

  private def fmtIdent(rnd: scala.util.Random, s: String): String =
    if (rnd.nextBoolean()) s"`$s`" else s

  private def fmtKw(rnd: scala.util.Random, s: String): String =
    if (rnd.nextBoolean()) s.toLowerCase else s

  test("random DDL histories: fold == model (60 rounds, seed-fixed)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 60).foreach { round =>
      // model: table -> ordered columns (name -> normalized type); pk list
      var model = Map.empty[String, Vector[(String, String)]]
      var modelPk = Map.empty[String, Vector[String]]
      val ddl = Vector.newBuilder[(Long, String)]
      var tso = 0L
      var colSeq = 0

      def freshCol(): (String, String, String) = {
        colSeq += 1
        val (raw, norm) = types(rnd.nextInt(types.length))
        (s"c$colSeq", raw, norm)
      }

      // dialect noise the parser must digest WITHOUT schema effect:
      // column charset/collation/comment, literal AND expression
      // defaults (8.0 parenthesized-expression form, incl. embedded
      // commas), table options incl. a partition clause, online-DDL
      // ALGORITHM/LOCK suffixes
      def colNoise(): String = rnd.nextInt(10) match {
        case 0 => " CHARACTER SET utf8mb4 COLLATE utf8mb4_bin"
        case 1 => " COMMENT 'fuzz, (col)'"
        case 2 => " GENERATED ALWAYS AS (c1 * 2) VIRTUAL"
        case 3 => " AS (coalesce(c1, 0)) STORED"
        case 4 => " DEFAULT 0"
        case 5 => " DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP"
        case 6 => " DEFAULT (lower(uuid()))"
        case 7 => " DEFAULT (coalesce(c1, 0) + 1)"
        case _ => ""
      }
      def tableNoise(): String = rnd.nextInt(3) match {
        case 0 =>
          " ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_unicode_ci" +
            " PARTITION BY HASH(c1) PARTITIONS 4"
        case 1 => // explicit partition list (the RANGE form)
          " PARTITION BY RANGE (c1) (PARTITION p0 VALUES LESS THAN (10)," +
            " PARTITION p1 VALUES LESS THAN MAXVALUE)"
        case _ => ""
      }
      def alterNoise(): String =
        if (rnd.nextBoolean()) ", ALGORITHM=INPLACE, LOCK=NONE" else ""
      // whole statements that must parse WITHOUT any schema effect:
      // partition maintenance, default changes (incl. expression form),
      // index add/drop/rename with index options, charset conversions —
      // the operational-DDL background noise of a real log
      def noopStatement(t: String): String = rnd.nextInt(14) match {
        case 0 => s"ALTER TABLE $t ADD PARTITION (PARTITION px VALUES LESS THAN (100))"
        case 1 => s"ALTER TABLE $t DROP PARTITION p0"
        case 2 => s"ALTER TABLE $t TRUNCATE PARTITION p0"
        case 3 => s"ALTER TABLE $t ALTER COLUMN c1 SET DEFAULT 'x'"
        case 4 => s"ALTER TABLE $t RENAME INDEX i1 TO i2"
        case 5 => s"ALTER TABLE $t CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci"
        case 6 => s"ALTER TABLE $t ADD INDEX ix$tso (c1) USING BTREE KEY_BLOCK_SIZE=8 COMMENT 'cover'"
        case 7 => s"ALTER TABLE $t ADD UNIQUE KEY ux$tso (c1(10) DESC) KEY_BLOCK_SIZE=4"
        case 8 => s"ALTER TABLE $t ALTER COLUMN c1 SET DEFAULT (now())"
        case 9 => s"ALTER TABLE $t REORGANIZE PARTITION p0 INTO " +
          "(PARTITION p0a VALUES LESS THAN (5), PARTITION p0b VALUES LESS THAN MAXVALUE)"
        case 10 => s"ALTER TABLE $t SPLIT PARTITION p0 INTO " +
          "(PARTITION pa VALUES LESS THAN (5), PARTITION pb VALUES LESS THAN MAXVALUE)"
        case 11 => s"ALTER TABLE $t MERGE PARTITIONS p0, p1 TO p01"
        case 12 => s"ALTER TABLE $t DEFAULT CHARACTER SET = utf8mb4"
        case _ => "FLUSH LOGS"
      }

      (1 to 40).foreach { _ =>
        tso += 1
        val tables = model.keys.toVector.sorted
        val choice = rnd.nextInt(10)
        if (tables.isEmpty || choice == 0) {
          // CREATE TABLE — sometimes with an index-prefixed USING BTREE
          // primary key and table/partition options
          val t = s"t${tso}"
          val cols = (0 to rnd.nextInt(3)).map(_ => freshCol()).toVector
          val rendered = cols.map { case (n, raw, _) =>
            s"${fmtIdent(rnd, n)} $raw NOT NULL${colNoise()}" }.mkString(", ")
          val pk = if (rnd.nextBoolean()) Vector(cols.head._1) else Vector.empty
          val pkOpts = rnd.nextInt(3) match {
            case 0 => " USING BTREE"
            case 1 => " USING BTREE KEY_BLOCK_SIZE=8"
            case _ => ""
          }
          val pkClause =
            if (pk.isEmpty) ""
            else s", ${fmtKw(rnd, "PRIMARY KEY")} (${pk.head}(10))$pkOpts"
          // a secondary index with options must never leak into columns/pk
          val keyClause = if (rnd.nextBoolean())
            s", KEY ix$tso (${cols.head._1}) USING BTREE KEY_BLOCK_SIZE=4"
          else ""
          ddl += ((tso,
            s"${fmtKw(rnd, "CREATE TABLE")}  ${fmtIdent(rnd, t)} " +
              s"($rendered$pkClause$keyClause)${tableNoise()}"))
          model += t -> cols.map(c => (c._1, c._3))
          modelPk += t -> pk
        } else {
          val t = tables(rnd.nextInt(tables.length))
          val cols = model(t)
          rnd.nextInt(7) match {
            case 0 => // DROP TABLE
              ddl += ((tso, s"${fmtKw(rnd, "DROP TABLE IF EXISTS")} $t"))
              model -= t
              modelPk -= t
            case 1 => // ADD COLUMN (possibly positioned, with noise flags)
              val (n, raw, norm) = freshCol()
              val pos =
                if (cols.isEmpty) ""
                else rnd.nextInt(3) match {
                  case 0 => " FIRST"
                  case 1 => s" AFTER ${cols(rnd.nextInt(cols.length))._1}"
                  case _ => ""
                }
              ddl += ((tso,
                s"ALTER TABLE ${fmtIdent(rnd, t)} ${fmtKw(rnd, "ADD COLUMN")} " +
                  s"$n $raw${colNoise()}$pos${alterNoise()}"))
              model += t -> (pos match {
                case " FIRST" => (n, norm) +: cols
                case "" => cols :+ ((n, norm))
                case p =>
                  val a = p.stripPrefix(" AFTER ")
                  val i = cols.indexWhere(_._1 == a)
                  (cols.take(i + 1) :+ ((n, norm))) ++ cols.drop(i + 1)
              })
            case 2 if cols.nonEmpty => // DROP COLUMN (pk member drops out)
              val (n, _) = cols(rnd.nextInt(cols.length))
              ddl += ((tso, s"ALTER TABLE $t ${fmtKw(rnd, "DROP COLUMN")} ${fmtIdent(rnd, n)}${alterNoise()}"))
              model += t -> cols.filterNot(_._1 == n)
              modelPk += t -> modelPk.getOrElse(t, Vector.empty).filterNot(_ == n)
            case 3 if cols.nonEmpty => // CHANGE COLUMN rename+retype
              val (n, _) = cols(rnd.nextInt(cols.length))
              colSeq += 1
              val n2 = s"r$colSeq"
              val (raw, norm) = types(rnd.nextInt(types.length))
              ddl += ((tso, s"ALTER TABLE $t CHANGE COLUMN $n $n2 $raw${colNoise()}"))
              model += t -> cols.map(c => if (c._1 == n) (n2, norm) else c)
              modelPk += t -> modelPk.getOrElse(t, Vector.empty)
                .map(p => if (p == n) n2 else p)
            case 4 if cols.nonEmpty => // MODIFY retype in place
              val (n, _) = cols(rnd.nextInt(cols.length))
              val (raw, norm) = types(rnd.nextInt(types.length))
              ddl += ((tso, s"alter table $t modify $n $raw${colNoise()}${alterNoise()}"))
              model += t -> cols.map(c => if (c._1 == n) (n, norm) else c)
            case 5 if rnd.nextBoolean() => // RENAME TABLE
              val t2 = s"rn$tso"
              ddl += ((tso, s"RENAME TABLE $t TO $t2"))
              model = model - t + (t2 -> cols)
              modelPk = modelPk - t + (t2 -> modelPk.getOrElse(t, Vector.empty))
            case 5 => // CREATE TABLE LIKE (both syntaxes) — clone schema
              val t2 = s"lk$tso"
              val stmt =
                if (rnd.nextBoolean()) s"CREATE TABLE ${fmtIdent(rnd, t2)} ${fmtKw(rnd, "LIKE")} $t"
                else s"create table $t2 (LIKE ${fmtIdent(rnd, t)})"
              ddl += ((tso, stmt))
              model += t2 -> cols
              modelPk += t2 -> modelPk.getOrElse(t, Vector.empty)
            case 6 => // QUALIFIED rename — same-schema or CROSS-schema
              val t2 = s"x$tso"
              rnd.nextInt(3) match {
                case 0 => // db.t -> other.t2: the state LEAVES the
                  // folded schema (only a tombstone remains under db)
                  ddl += ((tso,
                    s"RENAME TABLE ${fmtIdent(rnd, "db")}.${fmtIdent(rnd, t)} TO other.$t2"))
                  model -= t
                  modelPk -= t
                case 1 => // the ALTER form of the cross-schema move
                  ddl += ((tso, s"ALTER TABLE db.$t RENAME TO other.$t2"))
                  model -= t
                  modelPk -= t
                case _ => // fully qualified same-schema rename
                  ddl += ((tso, s"RENAME TABLE db.${fmtIdent(rnd, t)} TO db.$t2"))
                  model = model - t + (t2 -> cols)
                  modelPk = modelPk - t + (t2 -> modelPk.getOrElse(t, Vector.empty))
              }
            case _ if rnd.nextBoolean() => // paren-group multi-ADD
              val adds = (0 to rnd.nextInt(2)).map(_ => freshCol()).toVector
              val body = adds.map { case (n, raw, _) => s"$n $raw" }.mkString(", ")
              ddl += ((tso, s"ALTER TABLE db.$t ADD COLUMN ($body)"))
              model += t -> (cols ++ adds.map(c => (c._1, c._3)))
            case _ => // noise statement with no schema effect
              ddl += ((tso, noopStatement(t)))
          }
        }
      }

      // fold the rendered log; compare the final state per table —
      // scoped to schema db (a cross-schema rename moves state OUT, and
      // its new life under `other` must not read as a db table)
      val folded = DdlParser.foldSchema("db", ddl.result())
      val finalState = folded.filter(_._2 == "db").groupBy(_._3)
        .map { case (t, rows) =>
          t -> rows.maxBy(_._1)
        }.collect { case (t, (_, _, _, json, colNames)) if json != null =>
          t -> colNames
        }
      val expected = model.map { case (t, cols) =>
        t -> cols.map(_._1).mkString(",")
      }
      assert(finalState == expected,
        s"round $round diverged (seed-fixed):\n got=$finalState\n exp=$expected")
      // and types survive: spot-check the json of every live table
      model.foreach { case (t, cols) =>
        val json = folded.filter(r => r._2 == "db" && r._3 == t).maxBy(_._1)._4
        cols.foreach { case (n, norm) =>
          assert(json.contains(s""""name":"$n","type":"$norm""""),
            s"round $round table $t: column $n:$norm missing in $json")
        }
        // pk tracked through prefix-length/USING BTREE rendering, DROP
        // COLUMN and CHANGE renames — never polluted by index options
        val pkJson = modelPk.getOrElse(t, Vector.empty)
          .map(p => s""""$p"""").mkString("[", ",", "]")
        assert(json.contains(s""""pk":$pkJson"""),
          s"round $round table $t: pk mismatch, want $pkJson in $json")
      }
    }
  }
}
