package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewBucketingSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed frame: key "hot" holds 90% of rows
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"cold$i" else "hot", i.toLong, i.toDouble)
  }.toDF("k", "id", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedCountSum(skewed, Seq("k"), $"id", $"v", 16)
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
    // the salt actually spreads the hot key across buckets
    val spread = skewed.filter($"k" === "hot")
      .select(Skew.saltCol($"id", 16)).distinct().count()
    assert(spread == 16)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("cold10", "C10"), ("cold20", "C20"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select($"id", $"label")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), $"id", 8)
      .select($"id", $"label").as[(Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's warehouse dirs survive the in-memory catalog —
    // remove the locations or CREATE TABLE AS refuses to reuse them
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    val orders = graft.sources.Tables.orders(spark, sf)
    val lineitem = graft.sources.Tables.lineitem(spark, sf)
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs no shuffle of either side
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).toSeq
    assert(exchanges.size <= 1, // only the final groupBy may shuffle… and
      // even that reuses the bucket partitioning on o_orderkey → expect 0
      s"unexpected exchanges in bucketed join plan:\n$plan")
    // correctness unchanged
    assert(joined.count() == lineitem.select("l_orderkey").distinct().count())
  }
}
