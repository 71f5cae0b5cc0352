package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeEvent
import graft.sources.{ChangeStream, Tables}

/** Fixture data through the full stateful pipeline, with the RocksDB
  * state store provider engaged (the TxnBuffer-spill configuration) —
  * a separate session because the state store provider is session-wide. */
class RealisticPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // isolated session (shared context): the state store provider is a
    // per-session SQLConf, so set it on a newSession rather than fighting
    // getOrCreate's return-the-active-session behavior
    val s = graft.SparkSpec.session.newSession()
    Pipeline.rocksDbStateStore.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  test("sf0.001 events assemble into transactions under RocksDB state store") {
    implicit val sp: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val fixture = Tables.events(spark, "/root/testdata/sf0.001")
    val changes = ChangeStream.withCommits(
      ChangeStream.fromEvents(fixture))
    val evs = ChangeStream.toDataset(changes).collect().toSeq
    val expectedTxns = fixture.select("user_id").distinct().count()
    val expectedEvents = fixture.count()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-rocksdb").toString
    val input = MemoryStream[ChangeEvent]
    val out = Pipeline.assembleTransactions(input.toDS(), timeout = None)
    val q = out.writeStream.format("memory").queryName("realistic")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // feed in two waves split at a tso boundary to cross micro-batches
      val (w1, w2) = evs.partition(_.tso < 5000)
      input.addData(w1)
      q.processAllAvailable()
      input.addData(w2)
      q.processAllAvailable()
      val envs = spark.table("realistic").as[Pipeline.TxnEnvelope].collect()
      assert(envs.length == expectedTxns)
      assert(envs.map(_.nEvents.toLong).sum == expectedEvents)
      // intra-txn order: each envelope's ops came back trace-ordered; spot
      // check tso = the txn's max event id
      val byTxn = fixture.groupBy($"user_id")
        .agg(max($"event_id").as("mx"), count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect()
        .map { case (u, mx, n) => u -> ((mx, n)) }.toMap
      envs.foreach { e =>
        val (mx, n) = byTxn(e.txnId)
        assert(e.nEvents == n, s"txn ${e.txnId} event count")
        assert(e.tso == mx, s"txn ${e.txnId} commit tso")
      }
      // prove the RocksDB provider actually held the state: its
      // checkpoint layout contains per-partition .zip/.sst artifacts
      val stateFiles = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(s"$ckpt/state"), null, true)
      val hasRocks = stateFiles.stream().anyMatch(f =>
        f.getName.endsWith(".zip") || f.getName.endsWith(".sst") ||
          f.getName.endsWith(".changelog"))
      assert(hasRocks, s"no RocksDB artifacts under $ckpt/state")
    } finally q.stop()
  }
}
