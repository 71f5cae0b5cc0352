package graft.text

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sep = "\n\n"

  test("first occurrence wins globally; order inside docs preserved") {
    val docs = Seq(
      (1L, Seq("alpha one", "common quote", "alpha two").mkString(sep)),
      (2L, Seq("common quote", "beta one").mkString(sep)),
      (3L, Seq("gamma one", "common quote").mkString(sep)))
      .toDF("doc_id", "text")
    val got = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == Seq("alpha one", "common quote", "alpha two").mkString(sep))
    assert(got(2L) == "beta one")
    assert(got(3L) == "gamma one")
  }

  test("within-doc repeats collapse to the earliest position") {
    val docs = Seq((1L, Seq("x", "y", "x").mkString(sep)))
      .toDF("doc_id", "text")
    val got = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(got == Seq("x", "y").mkString(sep))
  }

  test("a doc that is entirely later copies keeps an empty string") {
    val docs = Seq(
      (1L, "only paragraph"),
      (2L, "only paragraph"))
      .toDF("doc_id", "text")
    val got = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "only paragraph", 2L -> ""))
  }

  test("extra columns pass through untouched") {
    val docs = Seq((1L, "p", "web"), (2L, "p", "news"))
      .toDF("doc_id", "text", "source")
    val got = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "web", "p"), (2L, "news", "")))
  }
}
