package graft.text

import graft.SparkSpec

/** `Chunking` — sliding-window chunk layout. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping chunks: starts at stride steps, last chunk reaches the end, no pure-suffix tails") {
    // 7 tokens, chunk 4, stride 2 → starts 0,2,4 (a start at 6 would
    // emit "g", a pure suffix of "e f g" — duplicate content)
    val doc = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.chunk(doc, "doc_id", "text",
        chunkTokens = 4, stride = 2)
      .orderBy($"chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 2L, 4L, "c d e f"),
      (1L, 2L, 4L, 3L, "e f g")))
    // 10 tokens, chunk 4, stride 2: start 8 ("i j") is covered by
    // start 6 ("g h i j") and must not appear
    val doc2 = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val starts = Chunking.chunk(doc2, "doc_id", "text", 4, 2)
      .orderBy($"chunk_id").select($"start_tok").as[Long].collect().toList
    assert(starts == List(0L, 2L, 4L, 6L))
  }

  test("stride == chunkTokens partitions the document exactly") {
    val doc = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunking.chunk(doc, "doc_id", "text",
        chunkTokens = 2, stride = 2)
      .orderBy($"chunk_id").as[(Long, Long, Long, Long, String)]
      .collect().toList
    assert(got.map(_._5) == List("a b", "c d", "e"))
    // every token appears exactly once
    assert(got.map(_._4).sum == 5L)
  }

  test("chunk layout law: every token covered, chunks equal token slices") {
    // seeded randomized law check against a Scala reference
    val rnd = new scala.util.Random(17)
    val cases = (1 to 20).map { i =>
      val n = 1 + rnd.nextInt(40)
      val chunkT = 1 + rnd.nextInt(10)
      val stride = 1 + rnd.nextInt(chunkT)
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "), chunkT, stride)
    }
    cases.foreach { case (id, text, chunkT, stride) =>
      val toks = text.split(" ")
      val got = Chunking.chunk(Seq((id, text)).toDF("doc_id", "text"),
          "doc_id", "text", chunkT, stride)
        .orderBy($"chunk_id")
        .as[(Long, Long, Long, Long, String)].collect()
      val n = toks.length
      val lastStart =
        if (n > chunkT) ((n - chunkT + stride - 1) / stride) * stride
        else 0
      val expStarts = 0 to lastStart by stride
      assert(got.map(_._3).toSeq == expStarts.map(_.toLong),
        s"starts for n=$n c=$chunkT s=$stride")
      got.foreach { case (_, cid, start, nT, chunk) =>
        val slice = toks.slice(start.toInt, start.toInt + chunkT)
        assert(chunk == slice.mkString(" "), s"chunk $cid")
        assert(nT == slice.length.toLong)
      }
      // coverage: every token index falls in at least one chunk
      val covered = got.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == toks.indices.map(_.toLong).toSet)
      // no pure-suffix duplicates: chunk ends strictly increase, so
      // every chunk contributes at least one new token
      val ends = got.map(c => c._3 + c._4).toList
      assert(ends == ends.distinct.sorted,
        s"duplicate-tail chunk for n=$n c=$chunkT s=$stride")
    }
  }

  test("NULL text emits no chunks (no phantom null chunk row)") {
    val doc = Seq((1L, null: String), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(doc, "doc_id", "text", 2, 1)
      .select($"doc_id").as[Long].collect()
    assert(got.forall(_ == 2L) && got.nonEmpty)
  }

  test("chunking is scan-stage only: no exchange in the plan") {
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunk(doc, "doc_id", "text", 2, 1)
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"))
    intercept[IllegalArgumentException] {
      Chunking.chunk(doc, "doc_id", "text", 2, 3) // stride > chunk
    }
  }
}
