package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class FullCopyMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkedScan: chunks partition the table completely and disjointly") {
    val orders = Tables.orders(spark, sf)
    val chunks = FullCopy.chunkedScan(orders, "o_orderkey", 4)
    assert(chunks.size == 4)
    val counts = chunks.map(_.count())
    assert(counts.sum == orders.count())     // complete
    // disjoint: summed distinct keys == total distinct keys
    val keys = chunks.map(_.select("o_orderkey").distinct().count()).sum
    assert(keys == orders.select("o_orderkey").distinct().count())
    // balanced-ish: quantile split keeps chunks within 2x of each other
    assert(counts.max <= counts.min * 2, s"unbalanced: $counts")
  }

  test("chunkIdColumn agrees with chunkedScan per-chunk counts") {
    val orders = Tables.orders(spark, sf)
    val bounds = FullCopy.chunkBounds(orders, "o_orderkey", 4)
    val onePass = orders
      .groupBy(FullCopy.chunkIdColumn("o_orderkey", bounds).as("chunk"))
      .count().as[(Int, Long)].collect().toMap
    val perChunk = FullCopy.chunkedScan(orders, "o_orderkey", 4)
      .zipWithIndex.map { case (c, i) => i -> c.count() }.toMap
    assert(onePass == perChunk)
    assert(!onePass.contains(-1)) // every row assigned
  }

  test("jdbcPredicates produce full coverage predicates") {
    val preds = FullCopy.jdbcPredicates(Tables.orders(spark, sf),
      "o_orderkey", 3)
    assert(preds.length == 3)
    assert(preds.head.startsWith("o_orderkey <"))
    assert(preds.last.matches("o_orderkey >= .*"))
  }

  test("observe tap reports rows and max position without an extra pass") {
    val events = Tables.events(spark, sf)
    import scala.collection.mutable
    val seen = mutable.Map[String, Seq[Any]]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.synchronized { seen(name) = row.toSeq }
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val tapped = Metrics.tap(events, "ingest", "event_id", "user_id")
      val n = tapped.count()
      // listener fires asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 20000
      while (!seen.synchronized(seen.contains("ingest")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val m = seen.synchronized(seen("ingest"))
      assert(m(0) == n)              // rows
      assert(m(1) == 0L)             // null keys
      assert(m(2) == events.agg(max($"event_id")).head().getLong(0))
    } finally spark.listenerManager.unregister(listener)
  }

  test("eps computes events per second per window") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:10"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:20"),
      java.sql.Timestamp.valueOf("2024-01-01 00:01:30")).toDF("ts")
    val got = Metrics.eps(df, "ts", "1 minute").orderBy($"w.start")
      .select($"events", $"eps").as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 2.0 / 60), (1L, 1.0 / 60)))
  }
}
