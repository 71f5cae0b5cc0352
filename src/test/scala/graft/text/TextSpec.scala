package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles empties and multiple spaces") {
    val df = Seq("one two three", "", "  padded   spaces  ", "solo")
      .toDF("text")
    val got = df.select(TextAnalysis.tokenCount($"text")).as[Long].collect()
    assert(got.toSeq == Seq(3L, 0L, 2L, 1L))
  }

  test("BPE-ish token estimate counts pieces, digits and punct") {
    val got = Seq("hello, world 42!").toDF("text")
      .select(TextAnalysis.tokenCountBpeIsh($"text")).as[Long].head()
    // hello , world 4 2 ! → 6
    assert(got == 6L)
  }

  test("charNgrams produces boundary-padded distinct n-grams") {
    val got = Seq("ab ab").toDF("text")
      .select(TextAnalysis.charNgrams($"text", 2)).as[Seq[String]].head()
    // " ab ab " → " a","ab","b "," a"(dup),"ab"(dup),"b "(dup) distinct
    assert(got == Seq(" a", "ab", "b "))
    val empty = Seq("").toDF("text")
      .select(TextAnalysis.charNgrams($"text", 3)).as[Seq[String]].head()
    assert(empty == Seq("  ") || empty.forall(_.length <= 3))
  }

  test("langId picks the profile with most stopword overlap") {
    val df = Seq(
      "the cat sat on the mat and it is a good day for the cat",
      "el gato y la casa de los perros en un día",
      "le chat et les maisons des chiens pour une femme",
      "der hund und die katze ist von den bergen mit ein freund",
      "这 是 中文 文本 的 一个 例子 我 不 知道",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got.toSeq == Seq("en", "es", "fr", "de", "zh", "und"))
    // diacritics decide when stopwords are absent
    val dia = Seq("señor espaÑa mañana", "garçon français très",
      "straße müller größe").toDF("text")
      .select(TextAnalysis.langId($"text")).as[String].collect()
    assert(dia.toSeq == Seq("es", "fr", "de"))
  }

  test("quality score is in [0,1] and favors punctuated prose") {
    val prose = "The quick brown fox jumps over the lazy dog. It is a fine day, and the fox knows it. What a day!"
    val junk = "AAAA BBBB CCCC DDDD"
    val got = Seq(prose, junk).toDF("text")
      .select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("rolling fingerprint: deterministic, shift-sensitive, ANSI-safe on long docs") {
    val long1 = (1 to 5000).map(i => s"w$i").mkString(" ")
    val df = Seq(long1, long1, "b " + long1).toDF("text")
    val fps = df.select(TextAnalysis.rollingFingerprint($"text")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < 2147483629L))
  }

  test("minhash LSH recovers planted near-duplicates without false floods") {
    def text(i: Long): String =
      (1 to 60).map(j => s"t${i}_$j w${(i * 31 + j) % 100}").mkString(" ")
    val docs = (0L until 20L).map { i =>
      // docs 0..18 distinct; doc 19 = near-copy of doc 0 with a tail
      if (i == 19L) (i, text(0) + " extra tail") else (i, text(i))
    }.toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = DedupApprox.minhashCandidatePairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5,
      stagingDir = Some(graft.operators.Staged.tempDir("textspec")))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 19L)))
    assert(pairs.size <= 2, s"unexpected false positives: $pairs")
    // the staged path must leave zero new cached RDD blocks behind
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty)
  }

  test("simhash: identical texts equal, near texts within small hamming") {
    val t = (1 to 200).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, t), (2L, t), (3L, t + " tail1 tail2 tail3"))
      .toDF("id", "text")
    val fp = df.select($"id",
      DedupApprox.simhash(split($"text", " ")).as("fp"))
    val m = fp.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val dist = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(dist <= 8, s"near-dup hamming too large: $dist")
  }

  test("contamination finds docs overlapping the benchmark set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "xx alpha beta gamma delta epsilon zeta yy"))
      .toDF("bench_id", "text")
    val hits = DedupApprox.contamination(corpus, "doc_id", "text",
        bench, "bench_id", "text", shingleN = 3, minOverlap = 2)
      .select($"doc_id", $"bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L)))
  }

  test("repetitionRatio: 0 for unique text, high for loops, empty-safe") {
    val df = Seq(
      "a b c d e f g h i j",
      "spam spam spam spam spam spam spam spam",
      "").toDF("text")
    val got = df.select(TextAnalysis.repetitionRatio($"text", 2))
      .as[Double].collect()
    assert(got(0) == 0.0)
    assert(got(1) > 0.8)
    assert(got(2) == 0.0)
  }

  test("jaccard identities: self=1, disjoint=0, known overlap") {
    val df = Seq(("a b c d", "a b c d"), ("a b c", "x y z"),
      ("a b c d e", "c d e f g")).toDF("t1", "t2")
    val got = df.select(DedupApprox.ngramJaccard($"t1", $"t2", 1))
      .as[Double].collect()
    assert(got(0) == 1.0)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 3.0 / 7.0) < 1e-9)
  }

  test("unicode text flows through the native kernels correctly") {
    val cases = Seq(
      "你好 世界 你好 世界 测试",          // CJK, with a repeated bigram
      "café münchen señor émigré naïve",   // diacritics
      "🎉 emoji 🎉 emoji tokens 🚀 here",  // surrogate pairs
      "mixed 中文 and english текст")      // mixed scripts
    val df = cases.toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text").as("toks"),
      size(DedupApprox.hashedShingles($"text", 2)).as("sh"))
      .as[(Long, Int)].collect()
    // naive reference per case
    cases.zip(got).foreach { case (text, (toks, sh)) =>
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(toks == words.length, s"tokens for: $text")
      assert(sh == words.sliding(2).toSeq.distinct.length, s"shingles for: $text")
    }
    // identical unicode texts → identical simhash
    val fps = Seq(cases.head, cases.head).toDF("text")
      .select(DedupApprox.simhash(TextAnalysis.tokens(lower($"text"))))
      .as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("hashedShingles preserves jaccard vs string shingles") {
    val df = Seq(("a b c d e f", "c d e f g h")).toDF("t1", "t2")
    val viaStrings = df.select(DedupApprox.jaccardFromShingles(
      DedupApprox.shingles($"t1", 2), DedupApprox.shingles($"t2", 2)))
      .as[Double].head()
    val viaHashes = df.select(DedupApprox.jaccardFromShingles(
      DedupApprox.hashedShingles($"t1", 2), DedupApprox.hashedShingles($"t2", 2)))
      .as[Double].head()
    assert(viaStrings == viaHashes)
  }

  test("q59 curation plan: document text never enters a shuffle") {
    // the dedup is hash-keyed — every exchange in the plan carries hashes
    // and numeric per-doc columns; shuffling the text column itself (as a
    // window over text would) is the scale bug this pins down. Exchanges
    // are inserted by EnsureRequirements during executedPlan preparation
    // (sparkPlan never contains them), and AQE wraps materialized stages
    // in leaf QueryStageExec nodes a plain collect can't see through — so
    // assert with AQE off against the executed plan.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q59 = graft.SparkEntry.queries("q59_curation")(spark, sf)
      val exchanges = q59.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected shuffles in the dedup plan")
      exchanges.foreach { e =>
        val cols = e.output.map(_.name.toLowerCase)
        assert(!cols.contains("text"),
          s"shuffle carries the document text: ${cols.mkString(",")}")
      }
      // and the result is non-degenerate
      assert(q59.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
