package graft.text

import graft.SparkSpec

/** `BpeTrainer` — distributed BPE merges vs a sequential reference. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // sequential reference: the textbook algorithm
  private def refTrain(words: Map[String, Long],
      k: Int): List[(String, String)] = {
    var vocab = words.map { case (w, f) => (w.split("").toList, f) }.toList
    var merges = List.empty[(String, String)]
    var continue = true
    while (merges.size < k && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) continue = false
      else {
        val best = eligible.toList
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges = merges :+ best
        vocab = vocab.map { case (syms, f) => (refMerge(syms, best), f) }
      }
    }
    merges
  }

  private def refMerge(syms: List[String],
      p: (String, String)): List[String] = syms match {
    case a :: b :: rest if (a, b) == p => (a + b) :: refMerge(rest, p)
    case a :: rest => a :: refMerge(rest, p)
    case Nil => Nil
  }

  test("train matches the sequential reference, merge by merge") {
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest low")).toDF("doc_id", "text")
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val expected = refTrain(words, 8)
    val got = BpeTrainer.train(docs, "text", numMerges = 8)
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty)
  }

  test("training stops when no pair repeats; single-char words survive") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(BpeTrainer.train(docs, "text", numMerges = 5).isEmpty)
  }

  test("segment applies merges greedily left-to-right") {
    val docs = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", numMerges = 3)
    // round 1: (a,a) count 2 per word (greedy: aa|ab -> pairs aa,ab)
    val segs = Seq("aaab").toDF("t")
      .select(BpeTrainer.segment($"t", merges)).as[Seq[String]].head()
    // whatever the merge path, the segmentation must reassemble the word
    assert(segs.mkString == "aaab")
    // and must equal the reference segmentation under the same merges
    val ref = merges.foldLeft(List("a", "a", "a", "b")) {
      case (syms, p) => refMerge(syms, p)
    }
    assert(segs.toList == ref)
  }

  test("determinism: same corpus, same merges, twice") {
    val docs = Seq((1L, "pay pays paid pay pays paid pain")).toDF("doc_id", "text")
    val m1 = BpeTrainer.train(docs, "text", 6)
    val m2 = BpeTrainer.train(docs, "text", 6)
    assert(m1 == m2)
  }
}
