package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "read http://spam.example/offer now"),
    (2L, "see https://ok.example/a and http://spam.example/b"),
    (3L, "both http://fine.example and https://ok.example/x"),
    (4L, "no urls at all"),
    (5L, "scheme-less spam.example mention survives"))
    .toDF("doc_id", "text")

  private lazy val blocklist = Seq("spam.example").toDF("domain")

  test("urls/domains extract scheme+host in document order") {
    val got = docs.filter($"doc_id" === 2L)
      .select(UrlFilter.urls($"text").as("u"), UrlFilter.domains($"text").as("d"))
      .as[(Seq[String], Seq[String])].head()
    assert(got._1 == Seq("https://ok.example", "http://spam.example"))
    assert(got._2 == Seq("ok.example", "spam.example"))
  }

  test("dropBlockedDomains removes any doc citing a blocked host; keeps the rest") {
    val kept = UrlFilter.dropBlockedDomains(docs, "text", blocklist)
      .select($"doc_id").as[Long].collect().sorted
    // 1 and 2 cite spam.example; 4 has no urls; 5 mentions the string
    // without a scheme (not a URL citation) — both survive
    assert(kept.toSeq == Seq(3L, 4L, 5L))
  }

  test("the documents side never shuffles: blocklist rides one broadcast row") {
    val filtered = UrlFilter.dropBlockedDomains(docs, "text", blocklist)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected a single-row broadcast join, got:\n$plan")
    // the only exchanges allowed are the blocklist's own collect_set agg
    // and its broadcast — never a shuffle keyed by the documents
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"documents side shuffled:\n$plan")
  }

  test("empty blocklist keeps everything") {
    val empty = Seq.empty[String].toDF("domain")
    assert(UrlFilter.dropBlockedDomains(docs, "text", empty).count() == 5L)
  }

  test("case does not evade the blocklist: hosts compare lowercased") {
    val shouty = Seq(
      (1L, "see HTTP://SPAM.EXAMPLE/OFFER"),
      (2L, "see HtTpS://Spam.Example/x"),
      (3L, "fine https://ok.example"))
      .toDF("doc_id", "text")
    val mixedList = Seq("Spam.Example").toDF("domain")
    val kept = UrlFilter.dropBlockedDomains(shouty, "text", mixedList)
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L))
  }

  test("null text survives: no URLs means no blocked citation") {
    val withNull = Seq((1L, Option("cite http://spam.example now")),
      (2L, Option.empty[String]), (3L, Option("clean")))
      .toDF("doc_id", "text")
    val kept = UrlFilter.dropBlockedDomains(withNull, "text", blocklist)
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("canonicalizeUrl: scheme/www/fragment/tracking junk all collapse") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme + www + case
      ("HTTPS://WWW.Site.Example/a", "site.example/a"),
      // fragment
      ("http://site.example/a#sec2", "site.example/a"),
      // leading tracking param with a real one behind it
      ("http://site.example/a?utm_source=x&id=3", "site.example/a?id=3"),
      // trailing tracking param only
      ("http://site.example/a?utm_campaign=y", "site.example/a"),
      // amp-prefixed tracking among real params
      ("http://site.example/a?id=3&utm_medium=z&p=2&fbclid=q",
        "site.example/a?id=3&p=2"),
      // nothing to do
      ("http://site.example/a?id=3", "site.example/a?id=3"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlFilter.canonicalizeUrl(col("url"))).as[String]
      .collect().toList
    assert(got == cases.map(_._2).toList)
  }

  test("dedupByUrl: latest crawl wins per canonical key, versions counted") {
    val crawls = Seq(
      (1L, "http://www.a.example/p?utm_source=x"),
      (5L, "https://a.example/p#frag"),          // same page, later crawl
      (3L, "http://b.example/q?id=1"),
      (4L, "http://b.example/q?id=2"))           // different page (real param)
      .toDF("seq", "url")
    val got = UrlFilter.dedupByUrl(crawls, "url", "seq")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(
      "a.example/p" -> ((5L, 2L)),
      "b.example/q?id=1" -> ((3L, 1L)),
      "b.example/q?id=2" -> ((4L, 1L))))
  }
}
