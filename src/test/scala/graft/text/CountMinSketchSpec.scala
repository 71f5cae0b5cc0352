package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `CountMinSketch` — fixed-size mergeable token-frequency sketch. */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat and dog and cat")).toDF("doc_id", "text")

  private def exact: Map[String, Long] =
    docs.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").count().as[(String, Long)].collect().toMap

  test("estimates never underestimate; wide sketch is exact") {
    val sk = CountMinSketch.build(docs, "text", depth = 4, width = 2048)
    val probes = exact.keys.toSeq.toDF("token")
    val est = CountMinSketch.estimate(probes, "token", sk, 4, 2048)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"underestimate for $t")
    }
    // 10 tokens in 2048 buckets: collisions are absent, sketch is exact
    assert(est == exact)
    // an unseen token estimates from whatever cells it hashes to —
    // bounded by εN, and 0 when its cells are empty
    val unseen = CountMinSketch.estimate(Seq("zzz").toDF("token"),
        "token", sk, 4, 2048).as[(String, Long)].collect().head._2
    assert(unseen >= 0L)
  }

  test("tiny width forces collisions but never an underestimate") {
    val sk = CountMinSketch.build(docs, "text", depth = 2, width = 3)
    val probes = exact.keys.toSeq.toDF("token")
    val est = CountMinSketch.estimate(probes, "token", sk, 2, 3)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) => assert(est(t) >= c) }
    val n = exact.values.sum
    est.values.foreach(e => assert(e <= n)) // no row exceeds the stream
  }

  test("sketches merge by addition: build(A ∪ B) == merge(build A, build B)") {
    val a = docs.filter($"doc_id" <= 1)
    val b = docs.filter($"doc_id" > 1)
    val whole = CountMinSketch.build(docs, "text", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = CountMinSketch.merge(
      CountMinSketch.build(a, "text", 4, 64),
      CountMinSketch.build(b, "text", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("the sketch is bounded: at most depth x width rows for any corpus") {
    val sk = CountMinSketch.build(docs, "text", depth = 3, width = 5)
    assert(sk.count() <= 15L)
  }
}
