package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact k-token span dedup: window hashing, global duplicate stats,
  * and the keep-first scrub. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  // doc 1 and doc 2 share the verbatim span "x y z"; doc 3 repeats its
  // own span internally; doc 4 is too short for any window
  private val docs = Seq(
    (1L, "a b x y z c d"),
    (2L, "p q x y z r"),
    (3L, "m n o w m n o w"),
    (4L, "t u")).toDF("doc_id", "text")

  test("windowHashes: one hash per k-window, short docs drop out") {
    val w = SpanDedup.windowHashes(docs, "doc_id", "text", k)
      .select($"doc_id", $"pos").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(w(1L) == (0 to 4))
    assert(w(2L) == (0 to 3))
    assert(w(3L) == (0 to 5))
    assert(!w.contains(4L))
  }

  test("spanStats marks cross-doc and within-doc duplicate spans") {
    val m = SpanDedup.spanStats(docs, "doc_id", "text", k)
      .select($"doc_id", $"n_spans", $"n_dup_spans")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == ((5L, 1L))) // "x y z" at pos 2
    assert(m(2L) == ((4L, 1L)))
    // doc 3 "m n o w m n o w": windows 0..5; repeated at +4 offsets:
    // (m n o)@0,4  (n o w)@1,5 → 4 duplicated spans
    assert(m(3L) == ((6L, 4L)))
    assert(!m.contains(4L))
  }

  test("scrub removes all-but-first occurrences, keep-first by (id,pos)") {
    val out = SpanDedup.scrubDuplicatedSpans(docs, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap
    // doc 1 is the first occurrence of "x y z" → untouched
    assert(out(1L) == "a b x y z c d")
    // doc 2's copy loses exactly those 3 tokens
    assert(out(2L) == "p q r")
    // doc 3: later duplicate windows cover tokens 4..7 → first half stays
    assert(out(3L) == "m n o w")
    // short doc: no windows, untouched
    assert(out(4L) == "t u")
  }

  test("an exact mirror scrubs to an EMPTY row, not a missing one") {
    val mirrors = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val out = SpanDedup.scrubDuplicatedSpans(mirrors, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap
    // doc 2's only window is a later duplicate — all its tokens go;
    // the row must survive with empty text (a missing row would read
    // as data loss to any caller joining scrubbed text back by id)
    assert(out == Map(1L -> "x y z", 2L -> ""))
  }

  test("scrub elects winners by aggregation — no Window over hash") {
    // a window over the span hash single-tasks every occurrence of a
    // ubiquitous span; the election must stay map-side-combinable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SpanDedup.scrubDuplicatedSpans(docs, "doc_id", "text", k)
        .queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, plan.toString.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("stats survive a corpus with no duplicates at all") {
    val clean = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val m = SpanDedup.spanStats(clean, "doc_id", "text", k)
      .select($"doc_id", $"n_dup_spans").as[(Long, Long)].collect().toMap
    assert(m.values.forall(_ == 0L))
    val scrubbed = SpanDedup.scrubDuplicatedSpans(clean, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "a b c d" && scrubbed(2L) == "e f g h")
  }

  test("crossSpanContamination counts verbatim benchmark windows only") {
    // k=3 here: pool doc 10 embeds a reference trigram, doc 11 shares
    // no window, doc 12 IS a reference doc verbatim
    val reference = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three")).toDF("doc_id", "text")
    val pool = Seq(
      (10L, "x alpha beta gamma y"),   // windows: 3; 1 contaminated
      (11L, "p q r s"),                // windows: 2; 0 contaminated
      (12L, "one two three"),          // windows: 1; 1 contaminated
      (13L, "a b")                     // < k tokens: no row
    ).toDF("doc_id", "text")
    val got = SpanDedup.crossSpanContamination(pool, reference,
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(10L -> ((3L, 1L)), 11L -> ((2L, 0L)),
      12L -> ((1L, 1L))))
  }

  test("maximalDupSpans merges adjacent duplicate windows into exact span boundaries") {
    // a 6-token passage "u v w x y z" planted verbatim in two docs,
    // at token 2 of doc 20 and token 1 of doc 21; doc 22 shares
    // nothing. k=3 → windows quantize the passage into 4 fragments;
    // the maximal span must report it as ONE span with exact bounds.
    val pool = Seq(
      (20L, "a b u v w x y z c"),
      (21L, "p u v w x y z"),
      (22L, "m n o q r s t")).toDF("doc_id", "text")
    val spans = SpanDedup.maximalDupSpans(pool, "doc_id", "text", k = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(spans == Set((20L, 2, 6, 4L), (21L, 1, 6, 4L)))

    // two DISJOINT duplicated passages in one doc stay two spans
    // (the non-duplicated middle breaks the island)
    val pool2 = Seq(
      (30L, "u v w 1 2 3 x y z"),
      (31L, "u v w 9 8 7 x y z")).toDF("doc_id", "text")
    val spans2 = SpanDedup.maximalDupSpans(pool2, "doc_id", "text", k = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(spans2 == Set((30L, 0, 3, 1L), (30L, 6, 3, 1L),
      (31L, 0, 3, 1L), (31L, 6, 3, 1L)))

    // mergeGap = k unions token-OVERLAPPING removal ranges: duplicated
    // windows at pos 0 and pos 2 (sharing token 2) merge into one
    // removal span covering tokens 0..4
    val pool3 = Seq(
      (40L, "u v w g x y z h h"),
      (41L, "u v w q x y z")).toDF("doc_id", "text")
    val gapped = SpanDedup.maximalDupSpans(pool3, "doc_id", "text",
        k = 3, mergeGap = 3)
      .filter($"doc_id" === 40L)
      .as[(Long, Int, Int, Long)].collect().toSet
    // windows "u v w" (pos 0) and "x y z" (pos 4) are 4 apart: with
    // mergeGap=3 they stay separate; with mergeGap=4 they union
    assert(gapped == Set((40L, 0, 3, 1L), (40L, 4, 3, 1L)))
    val unioned = SpanDedup.maximalDupSpans(pool3, "doc_id", "text",
        k = 3, mergeGap = 4)
      .filter($"doc_id" === 40L)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(unioned == Set((40L, 0, 7, 2L)))
  }

  test("maximalDupSpans plan: duplicate detection aggregates; the only window partitions by document") {
    // a ubiquitous boilerplate span can occur 10^8 times — its hash
    // must flow through a map-side-combinable aggregate; the islands
    // window must partition by the DOCUMENT id (bounded by document
    // length), never by the hash
    val plan = SpanDedup.maximalDupSpans(docs, "doc_id", "text", k)
      .queryExecution.optimizedPlan.toString
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(l =>
      l.contains("doc_id") && !l.contains("hash#")),
      s"window partitions by something other than the document:\n" +
        winLines.mkString("\n"))
  }
}
