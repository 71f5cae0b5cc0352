package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*): Seq[(String, Long, Long, Long)] =
    texts.toDF("text").select(
      Scrub.redactAll($"text"),
      Scrub.emailCount($"text"),
      Scrub.phoneCount($"text"),
      Scrub.ipCount($"text"))
      .as[(String, Long, Long, Long)].collect().toSeq

  test("emails, phones and IPs redact to tokens with counts") {
    val got = scrub(
      "mail a.user+tag@sub.example.org or b@x.io now",
      "call 555-123-4567 or 555.987.6543",
      "host 10.0.34.7 and 192.168.1.255",
      "mixed: c@d.net at 172.16.0.1, dial 800-555-0199")
    assert(got == Seq(
      ("mail <EMAIL> or <EMAIL> now", 2L, 0L, 0L),
      ("call <PHONE> or <PHONE>", 0L, 2L, 0L),
      ("host <IP> and <IP>", 0L, 0L, 2L),
      ("mixed: <EMAIL> at <IP>, dial <PHONE>", 1L, 1L, 1L)))
  }

  test("clean text passes through untouched") {
    val text = "the quick brown fox jumps over 42 lazy dogs."
    assert(scrub(text) == Seq((text, 0L, 0L, 0L)))
  }

  test("redaction is idempotent") {
    val once = Seq("x a@b.co 10.1.2.3 555-123-4567 y").toDF("text")
      .select(Scrub.redactAll($"text").as("text"))
    val twice = once.select(Scrub.redactAll($"text"))
      .as[String].head()
    assert(twice == once.as[String].head())
    assert(twice == "x <EMAIL> <IP> <PHONE> y")
  }

  test("boundaries: versions and decimals are not phones or IPs") {
    val got = scrub("release v1.2.3.4567 is not an ip, 1.5 not a phone")
    assert(got.head._1.contains("v1.2.3.4567")) // \b guards the quad
    assert(got.head == (
      "release v1.2.3.4567 is not an ip, 1.5 not a phone", 0L, 0L, 0L))
  }

  test("scrubbing stays in the scan stage: no shuffle in the plan") {
    val plan = Seq("a@b.co").toDF("text")
      .select(Scrub.redactAll($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
