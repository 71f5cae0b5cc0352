package graft.ml

import graft.SparkSpec

/** `SemanticDedup` — cluster-blocked embedding dedup (SemDeDup shape). */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated directions; near-identical copies within each
  private def v(base: Array[Float], eps: Float): Array[Float] =
    base.map(_ + eps)
  private val a = Array(1f, 0f, 0f, 0f)
  private val b = Array(0f, 1f, 0f, 0f)
  private val corpus = Seq(
    (1L, a), (2L, v(a, 0.001f)), (3L, v(a, 0.002f)),    // dup chain on a
    (10L, b), (11L, v(b, 0.001f)),                       // dup pair on b
    (20L, Array(0f, 0f, 1f, 0f)),                        // singletons
    (21L, Array(0f, 0f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("keepFlags keeps the min-id representative, drops the rest") {
    val model = SemanticDedup.train(corpus, "embedding", nCells = 4,
      seed = 7L)
    val kept = SemanticDedup.keepFlags(corpus, "vec_id", "embedding",
        model, threshold = 0.999)
      .as[(Long, Boolean)].collect().toMap
    assert(kept.size == 7)
    assert(kept(1L) && !kept(2L) && !kept(3L)) // chain collapses to id 1
    assert(kept(10L) && !kept(11L))
    assert(kept(20L) && kept(21L))             // singletons untouched
  }

  test("clusterPairs scores only within-cluster candidates above threshold") {
    val model = SemanticDedup.train(corpus, "embedding", nCells = 4,
      seed = 7L)
    val pairs = SemanticDedup.clusterPairs(corpus, "vec_id", "embedding",
        model, threshold = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // the planted dups must all pair up; distinct directions must not
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(pairs.contains((10L, 11L)))
    assert(!pairs.exists { case (x, y) => (x <= 3L) != (y <= 3L) })
  }

  test("recommendedCells scales cluster count with the corpus") {
    import SemanticDedup.recommendedCells
    assert(recommendedCells(0L) == 1)
    assert(recommendedCells(10000L) == 1)          // exactly one target cluster
    assert(recommendedCells(10001L) == 2)          // ceil, not floor
    assert(recommendedCells(1000L * 1000 * 1000) == 100000) // 1e9/1e4
    assert(recommendedCells(Long.MaxValue) == (1 << 20))    // bounded
    // the sizing invariant the default cap relies on: expected cluster
    // size never exceeds the target, which sits 10x under the cap
    Seq(1L, 9999L, 10001L, 123456789L).foreach { n =>
      val cells = recommendedCells(n)
      assert(n.toDouble / cells <= 10000.0 + 1e-9)
    }
  }

  test("guard trips at the DEFAULT cap on an oversized cluster") {
    import org.apache.spark.sql.functions._
    // one degenerate cluster holding cap+1 rows: quadratic single-task
    // work the default configuration must refuse, not attempt
    val big = spark.range(SemanticDedup.DefaultMaxClusterRows + 1)
      .select(col("id").as("vec_id"),
        array(lit(1f), lit(0f)).as("embedding"))
    // 2 cells, but every vector is identical → one cell gets them all
    val model = SemanticDedup.train(big.limit(100), "embedding",
      nCells = 2, seed = 7L)
    val ex = intercept[Exception] {
      SemanticDedup.clusterPairs(big, "vec_id", "embedding", model,
        threshold = 0.999).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxClusterRows")),
      s"expected the cluster-guard raise_error, got: $ex")
  }

  test("cluster-cardinality guard fires in-plan when nCells is too small") {
    val model = SemanticDedup.train(corpus, "embedding", nCells = 2,
      seed = 7L)
    val ex = intercept[Exception] {
      SemanticDedup.clusterPairs(corpus, "vec_id", "embedding", model,
        threshold = 0.5, maxClusterRows = 1L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxClusterRows")),
      s"expected the cluster-guard raise_error, got: $ex")
  }
}
