package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, 100L), (2L, 300L), (3L, 50L), (4L, 400L), (5L, 120L),
    (6L, 10L), (7L, 0L), (8L, 256L))
    .toDF("doc_id", "toks")

  private def pack(parts: Int) =
    Packing.packSequences(docs, "doc_id", "toks", seqLen = 256,
        numParts = parts)
      .select($"doc_id", $"start_tok", $"seq_first", $"seq_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("offsets are the exact prefix sums in shuffle-key order") {
    val got = pack(3)
    // recompute sequentially in Scala with the same portable key
    def key(id: Long) = ((id % 2147483647L) * 1103515245L + 12345L) %
      2147483647L * 48271L % 2147483647L
    val order = Seq(1L -> 100L, 2L -> 300L, 3L -> 50L, 4L -> 400L,
      5L -> 120L, 6L -> 10L, 7L -> 0L, 8L -> 256L)
      .sortBy { case (id, _) => (key(id), id) }
    var acc = 0L
    val expected = order.map { case (id, t) =>
      val start = acc; acc += t
      (id, start, start / 256,
        math.max(start, start + t - 1) / 256)
    }.sortBy(_._1)
    assert(got == expected)
  }

  test("output is independent of the partition count") {
    assert(pack(1) == pack(2) && pack(2) == pack(7))
  }

  test("no single-partition exchange: the prefix sum is distributed") {
    val plan = Packing.packSequences(docs, "doc_id", "toks", 256, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("documents straddle sequence boundaries; zero-token docs occupy nothing") {
    val got = pack(2).map { case (id, s, f, l) => id -> ((s, f, l)) }.toMap
    // total tokens = 1236 over 256-token sequences
    val straddlers = got.values.count { case (_, f, l) => l > f }
    assert(straddlers >= 1, s"fixture should straddle: $got")
    val (s7, f7, l7) = got(7L)
    assert(f7 == l7 && f7 == s7 / 256) // zero tokens: a point, not a span
  }
}
