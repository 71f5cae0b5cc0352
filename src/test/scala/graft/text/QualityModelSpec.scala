package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def refHash(tok: String): Long =
    tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % QualityModel.HashMod)

  test("tokenHash matches the sequential fold") {
    val toks = Seq("the", "quick", "Σ", "")
    val got = toks.toDF("t")
      .select(QualityModel.tokenHash($"t")).as[Long].collect()
    assert(got.toSeq == toks.map(refHash))
  }

  test("scoreHashedBow is the exact sum of hashed-slot weights") {
    val dim = 16
    val weights = (0 until dim).map(s => (s, (s * 7 - 40).toLong))
      .toDF("slot", "w")
    val docs = Seq((1L, "a b c"), (2L, "a a a"), (3L, "")).toDF("doc_id", "text")
    val got = QualityModel.scoreHashedBow(docs, "text", weights, dim)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    def w(tok: String) = (refHash(tok) % dim).toInt * 7 - 40
    assert(got(1L) == w("a") + w("b") + w("c"))
    assert(got(2L) == 3L * w("a"))
    assert(got(3L) == w("")) // split("") yields one empty token; slot 0
  }

  test("missing slots score zero") {
    val weights = Seq((0, 5L)).toDF("slot", "w") // only slot 0 weighted
    val docs = Seq((1L, "zz yy xx")).toDF("doc_id", "text")
    val got = QualityModel.scoreHashedBow(docs, "text", weights, 1024)
      .select($"score").as[Long].head()
    // none of these tokens hash to slot 0 at dim 1024
    val expect = Seq("zz", "yy", "xx")
      .map(t => if (refHash(t) % 1024 == 0) 5L else 0L).sum
    assert(got == expect)
  }

  test("scan-stage: weights ride one broadcast row, corpus never shuffles") {
    val weights = (0 until 8).map(s => (s, s.toLong)).toDF("slot", "w")
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = QualityModel.scoreHashedBow(docs, "text", weights, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }
}
