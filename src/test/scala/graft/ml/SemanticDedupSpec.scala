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
