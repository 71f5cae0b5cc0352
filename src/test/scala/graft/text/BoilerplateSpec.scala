package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Boilerplate` — per-domain line-level boilerplate removal over
  * multi-line documents. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // a multi-line corpus: two domains sharing a header line; domain a's
  // footer is boilerplate there (3 docs), the same footer in domain b
  // appears once only
  private def corpus = Seq(
    (1L, "a", "intro one\nSUBSCRIBE NOW\ncontent alpha"),
    (2L, "a", "intro two\nSUBSCRIBE NOW\ncontent beta\n\nafter blank"),
    (3L, "a", "SUBSCRIBE NOW\ncontent gamma"),
    (4L, "a", "content delta only"),
    (5L, "b", "SUBSCRIBE NOW\nother content"),
    (6L, "b", "unrelated\nlines")
  ).toDF("doc_id", "source", "text")

  test("lines above the per-domain document frequency are boilerplate") {
    val b = Boilerplate.boilerplateLines(corpus, "doc_id", "text",
      "source", minDocs = 3)
      .select($"source", $"doc_freq").as[(String, Long)].collect().toSeq
    // only domain a's SUBSCRIBE NOW (3 docs); domain b's copy is 1 doc
    assert(b == Seq(("a", 3L)))
    // blank lines are never boilerplate, however frequent
    val blanky = Seq((1L, "a", "x\n\ny"), (2L, "a", "z\n\nw"),
      (3L, "a", "q\n\nr")).toDF("doc_id", "source", "text")
    assert(Boilerplate.boilerplateLines(blanky, "doc_id", "text",
      "source", 3).count() == 0)
  }

  test("removal drops only the domain's boilerplate, preserving order") {
    val out = Boilerplate.removeBoilerplate(corpus, "doc_id", "text",
        "source", minDocs = 3)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out(1L) == "intro one\ncontent alpha")
    assert(out(2L) == "intro two\ncontent beta\n\nafter blank")
    assert(out(3L) == "content gamma")
    assert(out(4L) == "content delta only") // untouched doc of domain a
    assert(out(5L) == "SUBSCRIBE NOW\nother content") // below threshold in b
    assert(out(6L) == "unrelated\nlines")
  }

  test("plan: boilerplate set broadcast; document text never shuffles") {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Boilerplate.removeBoilerplate(corpus, "doc_id", "text",
        "source", minDocs = 3)
      val plan = out.queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        plan.toString.take(800))
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the doc-frequency pass shuffles hashes; no exchange carries text
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        val cols = e.output.map(_.name)
        assert(!cols.contains("text"), s"text shuffled: $cols")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("repetitionRatio sees through multi-line text") {
    // repeated lines raise the duplicate-ngram ratio vs distinct lines
    val df = Seq(
      (1L, Seq.fill(6)("the same exact line body here").mkString("\n")),
      (2L, (1 to 6).map(i => s"every line number $i differs now").mkString("\n")))
      .toDF("id", "text")
      .select($"id", TextAnalysis.repetitionRatio($"text", 3).as("rep"))
      .as[(Long, Double)].collect().toMap
    assert(df(1L) > 0.7, s"repetitive multi-line doc scored ${df(1L)}")
    assert(df(2L) < df(1L))
  }
}
