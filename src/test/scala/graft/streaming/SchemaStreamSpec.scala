package graft.streaming

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

class SchemaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(rows: Seq[(Long, String, String, String, String, String)]) =
    rows.toDF("tso", "schemaName", "tableName", "kind", "ddl", "payload")

  test("interleaved DDL and rows resolve as-of across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schstream").toString
    val (ddlLog, out) = (s"$dir/ddl", s"$dir/out")

    // batch 1: CREATE at 10, rows at 5 (pre-schema), 20
    SchemaStream.applyBatch(mkBatch(Seq(
      (10L, "app", "t1", "ddl", "CREATE TABLE t1 (id BIGINT, a INT)", null),
      (5L, "app", "t1", "row", null, "p5"),
      (20L, "app", "t1", "row", null, "p20"))), ddlLog, out)
    // batch 2: ALTER at 30 and rows straddling it IN THE SAME BATCH
    SchemaStream.applyBatch(mkBatch(Seq(
      (30L, "app", "t1", "ddl", "ALTER TABLE t1 ADD COLUMN b TEXT", null),
      (25L, "app", "t1", "row", null, "p25"),
      (35L, "app", "t1", "row", null, "p35"))), ddlLog, out)

    val got = spark.read.parquet(out)
      .select("tso", "colNames").as[(Long, Option[String])].collect().toMap
    assert(got(5L).isEmpty)              // precedes any DDL
    assert(got(20L).contains("id,a"))    // after CREATE
    assert(got(25L).contains("id,a"))    // before the same-batch ALTER
    assert(got(35L).contains("id,a,b"))  // after it
  }

  test("batch replay does not duplicate the DDL log (cursor idempotence)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schreplay").toString
    val (ddlLog, out) = (s"$dir/ddl", s"$dir/out")
    val b = mkBatch(Seq(
      (10L, "app", "t1", "ddl", "CREATE TABLE t1 (id BIGINT)", null),
      (20L, "app", "t1", "row", null, "p")))
    SchemaStream.applyBatch(b, ddlLog, out)
    SchemaStream.applyBatch(b, ddlLog, out) // replay after a crash
    assert(spark.read.parquet(ddlLog).count() == 1) // DDL not duplicated
    // resolution still single-version correct
    val versions = graft.operators.DdlParser
      .foldDdlLog(spark.read.parquet(ddlLog)).collect()
    assert(versions.length == 1)
  }

  test("a transaction split across micro-batches keeps its tail (seqCol)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schsplit").toString
    val (ddlLog, out) = (s"$dir/ddl", s"$dir/out")
    def mk(rows: Seq[(Long, Long, String, String, String, String, String)]) =
      rows.toDF("tso", "seq", "schemaName", "tableName", "kind", "ddl", "payload")
    // txn at commit tso 20 SPLIT across batches: seq 0 lands in batch 1,
    // seq 1 in batch 2 — without a per-row key, batch 2's row would be
    // dropped as a replay of the recovered max tso
    SchemaStream.applyBatch(mk(Seq(
      (10L, 0L, "app", "t1", "ddl", "CREATE TABLE t1 (id BIGINT)", null),
      (20L, 0L, "app", "t1", "row", null, "p20a"))), ddlLog, out,
      seqCol = Some("seq"))
    val batch2 = mk(Seq(
      (20L, 1L, "app", "t1", "row", null, "p20b"),
      (30L, 0L, "app", "t1", "row", null, "p30")))
    SchemaStream.applyBatch(batch2, ddlLog, out, seqCol = Some("seq"))
    assert(spark.read.parquet(out).select("payload").as[String]
      .collect().toSet == Set("p20a", "p20b", "p30"))
    // and a replay of batch 2 still cannot duplicate
    SchemaStream.applyBatch(batch2, ddlLog, out, seqCol = Some("seq"))
    assert(spark.read.parquet(out).count() == 3)
  }

  test("vtso packing range is enforced, not silently wrapped") {
    // seq >= 2^20 would bleed into the NEXT tso's key range — the cursor
    // and row order would corrupt silently; it must fail loudly instead
    val dir = java.nio.file.Files.createTempDirectory("graft-schrange").toString
    def mk(rows: Seq[(Long, Long, String, String, String, String, String)]) =
      rows.toDF("tso", "seq", "schemaName", "tableName", "kind", "ddl", "payload")
    val e = intercept[Exception] {
      SchemaStream.applyBatch(mk(Seq(
        (20L, 1L << 20, "app", "t1", "row", null, "p"))),
        s"$dir/ddl", s"$dir/out", seqCol = Some("seq"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("vtso packing range")))
    // and an over-range tso likewise
    val e2 = intercept[Exception] {
      SchemaStream.applyBatch(mk(Seq(
        (1L << 43, 0L, "app", "t1", "row", null, "p"))),
        s"$dir/ddl2", s"$dir/out2", seqCol = Some("seq"))
    }
    assert(msgs(e2).exists(_.contains("vtso packing range")))
  }

  test("duplicate commit TSOs without seqCol are rejected, not half-applied") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schdup").toString
    intercept[IllegalArgumentException] {
      SchemaStream.applyBatch(mkBatch(Seq(
        (20L, "app", "t1", "row", null, "a"),
        (20L, "app", "t1", "row", null, "b"))), s"$dir/ddl", s"$dir/out")
    }
  }

  test("schema evolution driven FROM the wire: DDL events resolve rows as-of") {
    // the full consume-side composition: a binlog file carries DDL (as
    // QUERY statement events) interleaved with row events; the decoder
    // splits them back and the as-of schema join resolves each row
    // against the schema current at its TSO
    val dir = java.nio.file.Files.createTempDirectory("graft-schwire").toString
    val ev = Seq(
      (10L, 1L, "DDL", "app", "t1", Map.empty[String, String],
        Map.empty[String, String],
        "CREATE TABLE t1 (id BIGINT, a INT)", 1700000000L),
      (20L, 2L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "1"), null.asInstanceOf[String], 1700000001L),
      (30L, 3L, "DDL", "app", "t1", Map.empty[String, String],
        Map.empty[String, String],
        "ALTER TABLE t1 ADD COLUMN b TEXT", 1700000002L),
      (40L, 4L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "2"), null.asInstanceOf[String], 1700000003L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
      .coalesce(1).sortWithinPartitions("tso")
    graft.sinks.BinlogWire.writeChangeStreamBinlogFiles(ev,
      Map(("app", "t1") -> Seq("id")), s"$dir/wire", checksummed = true)
    val decoded = graft.sinks.BinlogWire.readBinlogFiles(spark, s"$dir/wire",
      Map(("app", "t1") -> Seq("id")))
    val rawDdl = decoded.filter($"op" === "DDL")
      .select($"tso", $"schemaName", $"ddl")
    val rows = decoded.filter($"op" =!= "DDL")
      .select($"tso", $"schemaName", lit("t1").as("tableName"))
    val resolved = graft.operators.SchemaCatalog.resolveDdlText(rows, rawDdl)
      .select($"tso", $"colNames").as[(Long, String)].collect().toMap
    assert(resolved(20L) == "id,a")    // between CREATE and ALTER
    assert(resolved(40L) == "id,a,b")  // after the ALTER
  }

  test("file-source streaming end-to-end with AvailableNow") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schs-e2e").toString
    val src = s"$dir/src"
    val batch = mkBatch(Seq(
      (10L, "app", "t1", "ddl", "CREATE TABLE t1 (id BIGINT, v DOUBLE)", null),
      (20L, "app", "t1", "row", null, "x")))
    batch.write.parquet(src)
    val q = SchemaStream.start(spark, src, batch.schema,
      s"$dir/ddl", s"$dir/out", s"$dir/ckpt")
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$dir/out")
      .select("tso", "colNames").as[(Long, String)].collect().toMap
    assert(got(20L) == "id,v")
  }
}
