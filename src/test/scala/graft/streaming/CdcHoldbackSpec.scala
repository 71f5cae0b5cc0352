package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.ChangeEvent
import graft.sinks.BinlogWire

/** Append-only holdback segments (the straggler-DN scale fix): one
  * lagging DN parks everyone else's transactions, and the per-trigger
  * holdback cost must be O(newly parked + released) — never a rewrite
  * of the whole backlog (run E's defect class; the reference merger
  * never re-buffers held tokens per poll, LogEventMerger.java:203-273).
  *
  * Pins, per test: segments are append-only (earlier segment files are
  * byte-untouched by later batches); release on barrier advance emits
  * exactly once in total order; size-tiered folds bound the live
  * segment count; a replayed fold batch rewrites identical wire files
  * and an identical manifest; the pre-segment full-holdback layout
  * upgrades in place; per-DN straggler telemetry names the laggard.
  */
class CdcHoldbackSpec extends SparkSpec {
  import spark.implicits._

  private val reg = Map(("db", "t") -> Seq("k", "seq", "v"))
  private val dns = Seq("dn1", "dn2")

  /** One single-row INSERT txn (txnId := tso := commit tso) on `dn`. */
  private def ins(tso: Long, dn: String): ChangeEvent =
    ChangeEvent(tso, tso, dn, s"$dn:$tso", "INSERT", "db", "t",
      new java.sql.Timestamp(1700000000000L), Map.empty,
      Map("k" -> tso.toString, "seq" -> "1", "v" -> s"a$tso"), None, 1L)

  /** A heartbeat at `tso` on `dn` — advances the frontier, never
    * reaches the log. */
  private def hb(tso: Long, dn: String): ChangeEvent =
    ChangeEvent(tso, tso, dn, s"$dn:$tso", "HEARTBEAT", "db", "t",
      new java.sql.Timestamp(1700000000000L), Map.empty, Map.empty,
      None, 1L)

  private def frame(rows: Seq[ChangeEvent]): DataFrame =
    (if (rows.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], ChangeEvent.schema)
    else spark.createDataFrame(rows))
      .select(ChangeEvent.schema.fieldNames.map(col): _*)

  private def emitted(out: String): Seq[Long] =
    BinlogWire.readBinlogFiles(spark, out, reg)
      .filter(col("op") === "INSERT")
      .select(col("log_file"), col("tso")).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)

  private def segFiles(work: String): Map[String, Map[String, Long]] = {
    val hold = new java.io.File(s"$work/hold")
    Option(hold.listFiles()).toSeq.flatten.filter(_.isDirectory)
      .map(d => d.getName -> Option(d.listFiles()).toSeq.flatten
        .filter(_.isFile)
        .map(f => f.getName -> f.length()).toMap)
      .toMap
  }

  private def manifest(work: String, batch: Long): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$work/hold/$batch.segments")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  test("straggler DN: parked rows append per batch (earlier segments " +
      "byte-untouched), catch-up releases exactly once in total order, " +
      "telemetry names the laggard") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold1")
    val (out, work) = (s"$root/out", s"$root/work")
    def emit(b: Long, rows: Seq[ChangeEvent]): Unit =
      CdcBinlog.emitBatch(frame(rows), b, dns, reg, Set.empty, out,
        work, numPartitions = 2, checksummed = false)

    // batch 0: dn2 delivers 5, dn1 delivers 10 and 20 → barrier 5
    emit(0L, Seq(ins(5, "dn2"), ins(10, "dn1"), ins(20, "dn1")))
    assert(emitted(out) == Seq(5L))
    assert(manifest(work, 0).size == 1 &&
      manifest(work, 0).head.startsWith("0,2,"))

    // dn2 stalls (heartbeats only, below dn1's data) — each batch
    // parks ONLY its own new rows; segment 0's files never change
    val seg0Before = segFiles(work)("0")
    emit(1L, Seq(ins(30, "dn1"), ins(40, "dn1"), hb(6, "dn2")))
    emit(2L, Seq(ins(50, "dn1"), hb(7, "dn2")))
    assert(emitted(out) == Seq(5L), "nothing may release while dn2 lags")
    assert(segFiles(work)("0") == seg0Before,
      "append-only: a later batch must not rewrite an earlier segment")
    val m2 = manifest(work, 2)
    assert(m2.size == 3, s"three live segments expected: $m2")
    assert(m2.exists(_.startsWith("1,2,")) && m2.exists(_.startsWith("2,1,")),
      s"per-batch segments carry only their own rows: $m2")

    // telemetry: dn2 is the named laggard; dn1 parked this trigger
    val t = CdcBinlog.readHoldTelemetry(work, 2L).get
    assert(t.heldRows == 5 && t.segments == 3)
    assert(t.lagByDn("dn2") == 50L - 7L && t.lagByDn("dn1") == 0L)
    assert(t.parkedTxnsByDn == Map("dn1" -> 1L))

    // dn2 catches up past everything → the whole backlog releases in
    // commit-TSO order, exactly once, fused with nothing left behind
    emit(3L, Seq(hb(60, "dn2")))
    assert(emitted(out) == Seq(5L, 10L, 20L, 30L, 40L, 50L))
    assert(manifest(work, 3).isEmpty)
    assert(CdcBinlog.readHoldTelemetry(work, 3L).get.heldRows == 0)
  }

  test("size-tiered folds bound the live segment count at " +
      "holdMaxSegments; conservation and order kept") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold2")
    val (out, work) = (s"$root/out", s"$root/work")
    def emit(b: Long, rows: Seq[ChangeEvent]): Unit =
      CdcBinlog.emitBatch(frame(rows), b, dns, reg, Set.empty, out,
        work, numPartitions = 2, checksummed = false,
        holdMaxSegments = 2)

    emit(0L, Seq(ins(5, "dn2"), ins(100, "dn1")))
    (1 to 5).foreach { i =>
      emit(i.toLong, Seq(ins(100L + i * 10, "dn1"), hb(5L + i, "dn2")))
      assert(manifest(work, i.toLong).size <= 2,
        s"batch $i: ${manifest(work, i.toLong)}")
    }
    // folds happened (a .c name is live) and nothing emitted yet
    assert(manifest(work, 5L).exists(_.contains(".c")),
      s"expected a folded segment: ${manifest(work, 5L)}")
    assert(emitted(out) == Seq(5L))
    emit(6L, Seq(hb(200, "dn2")))
    assert(emitted(out) == Seq(5L, 100L, 110L, 120L, 130L, 140L, 150L))
    assert(manifest(work, 6L).isEmpty)
  }

  test("a REPLAYED fold batch rewrites byte-identical wire files and " +
      "an identical manifest (inputs of the fold survive until N+1)") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold3")
    val (out, work) = (s"$root/out", s"$root/work")
    def emit(b: Long, rows: Seq[ChangeEvent]): Unit =
      CdcBinlog.emitBatch(frame(rows), b, dns, reg, Set.empty, out,
        work, numPartitions = 2, checksummed = false,
        holdMaxSegments = 2)

    emit(0L, Seq(ins(5, "dn2"), ins(10, "dn1")))
    emit(1L, Seq(ins(20, "dn1"), hb(6, "dn2")))
    val batch2 = Seq(ins(30, "dn1"), ins(7, "dn2"))
    emit(2L, batch2) // third live segment → fold fires
    val wire1 = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(_.isFile)
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val m1 = manifest(work, 2L)
    assert(m1.exists(_.contains(".c")), s"fold expected: $m1")

    emit(2L, batch2) // the replay (crash between emit and WAL commit)
    val wire2 = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(_.isFile)
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(wire2 == wire1, "replay must rewrite byte-identical files")
    assert(manifest(work, 2L) == m1, "replay must rewrite the manifest")

    emit(3L, Seq(hb(60, "dn2")))
    assert(emitted(out) == Seq(5L, 7L, 10L, 20L, 30L))
  }

  test("pre-segment layout (full holdback dir, no manifest) upgrades " +
      "in place: the legacy stage folds once and releases correctly") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold4")
    val (out, work) = (s"$root/out", s"$root/work")
    // simulate a batch-0 of the OLD layout: full holdback parquet (no
    // __commit_tso column, no manifest) + frontier sidecar
    frame(Seq(ins(10, "dn1"), ins(20, "dn1")))
      .write.parquet(s"$work/hold/0")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$work/hold"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/hold/0.frontier"),
      "barrier=5;dn1=20,0;dn2=5,0".getBytes("UTF-8"))

    def emit(b: Long, rows: Seq[ChangeEvent]): Unit =
      CdcBinlog.emitBatch(frame(rows), b, dns, reg, Set.empty, out,
        work, numPartitions = 2, checksummed = false)
    emit(1L, Seq(ins(30, "dn1"), hb(15, "dn2")))
    // barrier 15 → legacy row 10 releases through the upgrade fold
    assert(emitted(out) == Seq(10L))
    assert(manifest(work, 1L).size == 1 &&
      manifest(work, 1L).head.startsWith("1,2,"),
      s"legacy stage must fold into segment 1: ${manifest(work, 1L)}")
    emit(2L, Seq(hb(35, "dn2")))
    assert(emitted(out) == Seq(10L, 20L, 30L))
  }

  test("release read pushes the commit-tso predicate to the segment " +
      "scan (row-group pruning carries the straddler cost)") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold6")
    val (out, work) = (s"$root/out", s"$root/work")
    CdcBinlog.emitBatch(frame(Seq(ins(5, "dn2")) ++
      (1 to 50).map(i => ins(100L + i, "dn1"))), 0L, dns, reg,
      Set.empty, out, work, numPartitions = 2, checksummed = false)
    // the exact release-read plan shape emitBatch builds: explicit
    // segment schema + cts range filter over the parked segment
    val plan = spark.read.schema(CdcBinlog.segSchema)
      .parquet(s"$work/hold/0")
      .filter(col("__commit_tso") > 5L && col("__commit_tso") <= 120L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(__commit_tso") &&
      plan.contains("LessThanOrEqual(__commit_tso"),
      s"cts bounds must reach the parquet scan:\n$plan")
  }

  test("cross-DN XA branches parked in DIFFERENT segments fuse on " +
      "release (shared commit TSO)") {
    val root = java.nio.file.Files.createTempDirectory("graft-hold5")
    val (out, work) = (s"$root/out", s"$root/work")
    // a third DN lags so the fused txn stays parked after BOTH of its
    // branches arrived (with two DNs the second branch's arrival lifts
    // the barrier to the commit tso and releases immediately)
    def emit(b: Long, rows: Seq[ChangeEvent]): Unit =
      CdcBinlog.emitBatch(frame(rows), b, Seq("dn1", "dn2", "dn3"),
        reg, Set.empty, out, work, numPartitions = 2,
        checksummed = false)
    // txn 40: branch on dn1 arrives batch 0, branch on dn2 arrives
    // batch 1 — both carry the shared commit tso 40
    val b1 = ChangeEvent(40L, 40L, "dn1", "dn1:40", "INSERT", "db", "t",
      new java.sql.Timestamp(1700000000000L), Map.empty,
      Map("k" -> "40", "seq" -> "1", "v" -> "x1"), None, 1L)
    val b2 = ChangeEvent(40L, 40L, "dn2", "dn2:40", "INSERT", "db", "t",
      new java.sql.Timestamp(1700000000000L), Map.empty,
      Map("k" -> "40", "seq" -> "2", "v" -> "x2"), None, 1L)
    emit(0L, Seq(b1, ins(5, "dn2"), hb(6, "dn3")))
    emit(1L, Seq(b2, hb(7, "dn3")))
    assert(emitted(out) == Seq(5L))
    // both branches parked, in different segments
    assert(manifest(work, 1L).size == 2)
    emit(2L, Seq(hb(45, "dn3")))
    // one txn, both rows, adjacent in the log
    val rows = BinlogWire.readBinlogFiles(spark, out, reg)
      .filter(col("op") === "INSERT" && col("tso") === 40L)
      .select(col("after")("seq")).as[String].collect().toSeq.sorted
    assert(rows == Seq("1", "2"), s"both branches must emit: $rows")
    assert(emitted(out) == Seq(5L, 40L, 40L))
  }
}
