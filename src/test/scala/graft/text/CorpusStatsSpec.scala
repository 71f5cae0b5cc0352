package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; "the" in all 4, "cat"/"dog" in 2, the rest in 1
  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the dog sat quietly"), // "sat" in docs 1+3 → df 2
    (4L, "the dog howled"))
    .toDF("doc_id", "text")

  test("documentFrequency counts distinct docs per token") {
    val df = CorpusStats.documentFrequency(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(df == Map("the" -> 4L, "cat" -> 2L, "dog" -> 2L, "sat" -> 2L,
      "ran" -> 1L, "quietly" -> 1L, "howled" -> 1L))
  }

  test("rareTokenStats: occurrences below the fractional df threshold") {
    // threshold df*10 < ndocs*5 → df < 2: only the df=1 tokens are rare
    val got = CorpusStats.rareTokenStats(docs, "doc_id", "text",
        rareFracTenths = 5)
      .as[(Long, Long, Long)].collect()
      .map { case (id, t, r) => id -> ((t, r)) }.toMap
    assert(got == Map(
      1L -> (3L, 0L), // the cat sat — all df >= 2
      2L -> (3L, 1L), // ran
      3L -> (4L, 1L), // quietly
      4L -> (3L, 1L))) // howled
  }

  test("repeated occurrences count per occurrence, not per distinct token") {
    val rep = Seq((1L, "x x x y"), (2L, "y z")).toDF("doc_id", "text")
    // ndocs=2, frac 9/10 → rare iff df*10 < 18 → df=1 is rare ("x","z")
    val got = CorpusStats.rareTokenStats(rep, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (id, t, r) => id -> ((t, r)) }.toMap
    assert(got == Map(1L -> ((4L, 3L)), 2L -> ((2L, 1L))))
  }

  test("characteristicTerms: tf desc, then rarest df, then token order") {
    // doc 1: "the"×3 (df 2), "cat"×3 (df 1), "sat"×1 (df 1)
    // tf tie (the=3, cat=3) → cat wins on df 1 < 2; rank 3 = sat
    val kw = Seq(
      (1L, "the cat the cat the cat sat"),
      (2L, "the dog"))
      .toDF("doc_id", "text")
    val got = CorpusStats.characteristicTerms(kw, "doc_id", "text", k = 3)
      .as[(Long, Int, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 1)) == (("cat", 3L, 1L)))
    assert(got((1L, 2)) == (("the", 3L, 2L)))
    assert(got((1L, 3)) == (("sat", 1L, 1L)))
    // doc 2: tf tie at 1, df tie broken by rarity then alphabet
    assert(got((2L, 1)) == (("dog", 1L, 1L)))
    assert(got((2L, 2)) == (("the", 1L, 2L)))
    // k caps the output
    assert(!got.contains((1L, 4)))
  }

  test("vocabulary: dense lexicographic ids, tf/df correct, partition-invariant") {
    val expected = List(
      (0L, "cat", 2L, 2L), (1L, "dog", 2L, 2L), (2L, "howled", 1L, 1L),
      (3L, "quietly", 1L, 1L), (4L, "ran", 1L, 1L), (5L, "sat", 2L, 2L),
      (6L, "the", 4L, 4L))
    val got = CorpusStats.vocabulary(docs, "doc_id", "text")
      .orderBy($"token_id").as[(Long, String, Long, Long)].collect().toList
    assert(got == expected)
    // the two-phase rank must not depend on the partition count
    val got1 = CorpusStats.vocabulary(docs.repartition(7), "doc_id", "text",
        numParts = 3)
      .orderBy($"token_id").as[(Long, String, Long, Long)].collect().toList
    assert(got1 == expected)
  }

  test("postings: sorted distinct doc lists; dfMax drops stopword rows") {
    val got = CorpusStats.postings(docs, "doc_id", "text")
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("the") == ((4L, Seq(1L, 2L, 3L, 4L))))
    assert(got("cat") == ((2L, Seq(1L, 2L))))
    assert(got("howled") == ((1L, Seq(4L))))
    // repeated in-doc occurrences collapse (set, not bag)
    val rep = Seq((1L, "x x y"), (2L, "x")).toDF("doc_id", "text")
    val g2 = CorpusStats.postings(rep, "doc_id", "text")
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(g2("x") == Seq(1L, 2L))
    // the stopword cap
    val capped = CorpusStats.postings(docs, "doc_id", "text", dfMax = 2)
      .as[(String, Long, Seq[Long])].collect().map(_._1).toSet
    assert(!capped.contains("the") && capped.contains("cat"))
  }

  test("bm25 matches a direct Okapi computation; rare terms dominate") {
    val query = Seq("cat", "howled")
    val got = CorpusStats.bm25(docs, "doc_id", "text", query, k = 4)
      .as[(Long, Double, Long)].collect()
    // reference computation, straight from the formula
    val corpus = Map(1L -> "the cat sat", 2L -> "the cat ran",
      3L -> "the dog sat quietly", 4L -> "the dog howled")
      .view.mapValues(_.split(" ").toSeq).toMap
    val nd = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / nd
    def ref(doc: Long): Double = query.distinct.map { t =>
      val tf = corpus(doc).count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val df = corpus.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 *
          corpus(doc).size / avgdl))
      }
    }.sum
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L)) // docs matching a term
    got.foreach { case (id, score, _) =>
      assert(math.abs(score - ref(id)) < 1e-9, s"doc $id: $score vs ${ref(id)}")
    }
    // "howled" (df 1) outweighs "cat" (df 2): doc 4 ranks first
    assert(got.head._1 == 4L)
    // matched_terms counts the query terms present
    assert(got.map(r => r._1 -> r._3).toMap == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    // the explode-pass budget (r10 advisory): at most TWO corpus-wide
    // explode passes — lens is staged once and read back, df derives
    // from tf instead of re-aggregating the token stream
    val q = CorpusStats.bm25(docs, "doc_id", "text", query, k = 4)
    q.collect()
    assert(finalPlanGenerates(q) <= 2,
      s"bm25 runs ${finalPlanGenerates(q)} explode passes")
  }

  test("vocabCoverage: top-N cut is deterministic on the (tf, token) total order; OOV counts occurrences") {
    // corpus tfs: the=4, cat=2, sat=2, dog=2, ran=1, quietly=1, howled=1
    // top-3 by (tf desc, token asc): the, cat, dog — the tf-2 TIE
    // between cat/dog/sat cuts on token order (cat < dog < sat)
    val cov = CorpusStats.vocabCoverage(docs, "doc_id", "text", 3)
      .select($"doc_id", $"n_tokens", $"n_oov")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cov == Map(
      1L -> ((3L, 1L)), // the cat sat → sat OOV
      2L -> ((3L, 1L)), // the cat ran → ran OOV
      3L -> ((4L, 2L)), // the dog sat quietly → sat, quietly OOV
      4L -> ((3L, 1L)))) // the dog howled → howled OOV
    // a vocab covering everything → zero OOV everywhere
    val full = CorpusStats.vocabCoverage(docs, "doc_id", "text", 100)
      .select($"n_oov").as[Long].collect()
    assert(full.forall(_ == 0L))
    // the top-N select is a TakeOrderedAndProject, never a global sort
    val q = CorpusStats.vocabCoverage(docs, "doc_id", "text", 3)
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  /** Generate (explode) nodes in the EXECUTED final plan — the AQE
    * string prints an `== Initial Plan ==` section too, which must
    * not double-count. */
  private def finalPlanGenerates(q: org.apache.spark.sql.DataFrame): Int =
    "(?m)^.*\\bGenerate\\b".r.findAllIn(
      q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head).size

  test("searchRank: integer-exact scores, rarity-weighted, total order") {
    val got = CorpusStats.searchRank(docs, "doc_id", "text",
      Seq("cat", "howled"), k = 10)
      .as[(Long, Long, Long)].collect().toList
    // weights: N=4 docs → cat (df 2) = 2000, howled (df 1) = 4000
    assert(got == List((4L, 4000L, 1L), (1L, 2000L, 1L), (2L, 2000L, 1L)))
    // top-k is a TakeOrderedAndProject, never a full global sort
    val q = CorpusStats.searchRank(docs, "doc_id", "text",
      Seq("cat"), k = 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    // ONE corpus explode pass: df derives from tf, and the doc count
    // aggregates the raw docs table (no token stream involved)
    q.collect()
    assert(finalPlanGenerates(q) <= 1,
      s"searchRank runs ${finalPlanGenerates(q)} explode passes:\n" +
        q.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head)
  }
}
