package graft.text

import graft.SparkSpec

/** DSIR-style importance scoring: target-like pool documents clear the
  * smoothed ratio test, off-target ones do not, and the arithmetic is
  * integer-exact. */
class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  test("target-like documents keep, off-target documents drop") {
    // target: cooking-flavored bigrams; pool: two cooking docs among
    // unrelated ones — the planted pair must be the kept set
    val target = Seq(
      (1L, "stir the sauce slowly and season the sauce well"),
      (2L, "simmer the broth then season the broth again"),
      (3L, "whisk the eggs and fold the eggs gently")).toDF("doc_id", "text")
    val pool = Seq(
      (101L, "season the sauce and simmer the broth"), // target-like
      (102L, "whisk the eggs gently and season the sauce slowly"), // target-like
      (103L, "compile the kernel with debug symbols enabled"),
      (104L, "the quarterly report shows revenue growth ahead"),
      (105L, "galaxies rotate faster than visible mass predicts"))
      .toDF("doc_id", "text")
    val kept = ImportanceSampling
      .importanceScores(pool, target, "doc_id", "text", dim)
      .filter($"keep" === 1L).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(101L, 102L))
  }

  test("scores are integer-exact and reproducible from first principles") {
    val target = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val pool = Seq((10L, "a b x"), (11L, "x y z")).toDF("doc_id", "text")
    val rows = ImportanceSampling
      .importanceScores(pool, target, "doc_id", "text", dim)
      .select($"doc_id", $"n_bigrams", $"aff_target", $"aff_pool", $"keep")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // recompute by hand with the same fold
    def h(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483629L) % dim
    val tCounts = Seq("a b", "b a", "a b", "b c").map(h)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val poolDocs = Map(10L -> Seq("a b", "b x"), 11L -> Seq("x y", "y z"))
    val sCounts = poolDocs.values.flatten.map(h).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = 4L
    val sTot = 4L
    poolDocs.foreach { case (id, bgs) =>
      val n = bgs.map(h).groupBy(identity).view.mapValues(_.size.toLong)
      val affT = n.map { case (b, c) => c * (tCounts.getOrElse(b, 0L) + 1) }.sum
      val affS = n.map { case (b, c) => c * (sCounts(b) + 1) }.sum
      val keep = if (affT * (sTot + dim) > affS * (tTot + dim)) 1L else 0L
      assert(rows(id) == ((id, bgs.size.toLong, affT, affS, keep)), s"doc $id")
    }
  }

  test("short and empty documents carry no evidence and produce no row") {
    val target = Seq((1L, "a b c")).toDF("doc_id", "text")
    val pool = Seq((10L, "a b"), (11L, "solo"), (12L, "")).toDF("doc_id", "text")
    val ids = ImportanceSampling
      .importanceScores(pool, target, "doc_id", "text", dim)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(10L)) // one bigram; 11/12 have none
  }
}
