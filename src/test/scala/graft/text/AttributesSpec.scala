package graft.text

import graft.SparkSpec

/** `Attributes` — tag-don't-drop curation signals. */
class AttributesSpec extends SparkSpec {
  import spark.implicits._

  private val clean = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the quiet green woods before the long night"
  private val docs = Seq(
    (1L, clean),                                     // no flags
    (2L, "too short"),                               // too_short
    (3L, ("x1 " * 30).trim),                         // digit_heavy + low_alpha
    (4L, clean + " contact me at alice@example.com"),// has_email
    (5L, clean + " see https://example.com/page"),   // has_url
    (6L, ("!!! ### $$$ %%% " * 8).trim)              // low_alpha (+ short)
  ).toDF("doc_id", "text")

  test("each attribute fires on its crafted document and nowhere else") {
    val t = Attributes.tag(docs, "text")
      .select($"doc_id", $"attr_too_short", $"attr_low_alpha",
        $"attr_digit_heavy", $"attr_has_email", $"attr_has_url", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(t(1L) == ((1L, false, false, false, false, false, true)))
    assert(t(2L)._2 && !t(2L)._7)                 // too_short drops
    assert(t(3L)._4 && !t(3L)._7)                 // digit_heavy drops
    assert(t(4L)._5 && t(4L)._7)                  // email tags but KEEPS
    assert(t(5L)._6 && t(5L)._7)                  // url tags but KEEPS
    assert(t(6L)._3 && !t(6L)._7)                 // low_alpha drops
  }

  test("tags array mirrors the boolean columns; report counts them") {
    val t = Attributes.tag(docs, "text")
    val tags = t.select($"doc_id", $"tags").as[(Long, Seq[String])]
      .collect().toMap
    assert(tags(1L).isEmpty)
    assert(tags(2L).contains("too_short"))
    assert(tags(4L).contains("has_email"))
    val report = Attributes.tagReport(t)
      .as[(String, Long)].collect().toMap
    assert(report("has_email") == 1L)
    assert(report("has_url") == 1L)
    assert(report("too_short") >= 1L)
    // report total == total tag occurrences
    assert(report.values.sum == tags.values.map(_.size).sum)
  }

  test("tag() is a pure scan-stage pass: no exchange in the plan") {
    val plan = Attributes.tag(docs, "text").queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "attribute tagging must not shuffle")
  }
}
