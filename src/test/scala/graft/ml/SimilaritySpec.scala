package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine: identical=1, orthogonal=0, zero-safe") {
    val df = Seq(
      (vec(1, 2, 3), vec(1, 2, 3)),
      (vec(1, 0), vec(0, 1)),
      (vec(0, 0), vec(1, 1))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-6)
    assert(math.abs(got(1)) < 1e-6)
    assert(got(2) == 0.0)
  }

  test("bruteForceTopK returns the true nearest neighbors in order") {
    val corpus = Seq(
      (0L, vec(1, 0)), (1L, vec(0.9, 0.1)), (2L, vec(0, 1)),
      (3L, vec(-1, 0)), (4L, vec(0.8, 0.6))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L)
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
      .orderBy($"rank").select("corpus_id").as[Long].collect().toSeq
    // nearest to (1,0): id1 (cos≈0.994), id4 (0.8), id2 (0)
    assert(got == Seq(1L, 4L, 2L))
  }

  test("lshTopK results are a subset of brute-force candidates with matching sims") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 100L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3L)
    val lsh = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      k = 5, numPlanes = 4, dim = 16)
    val rows = lsh.select("query_id", "corpus_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // every reported sim must equal the directly computed cosine
    val all = corpus.as[(Long, Array[Float])].collect().toMap
    rows.foreach { case (q, c, s) =>
      val (a, b) = (all(q), all(c))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      assert(math.abs(s - dot / (na * nb)) < 1e-6)
    }
  }

  test("staged near-dup pairing leaves zero new cached RDD blocks") {
    val rnd = new scala.util.Random(13)
    val df = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9, numPlanes = 4, dim = 16,
      stagingDir = Some(graft.operators.Staged.tempDir("simspec"))).count()
    assert(n >= 0)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"staged path must not cache: new persistent RDDs ${after -- before}")
  }

  test("quantizeInt8: bounded components, exact reconstruction bound, zero-safe") {
    import graft.ml.Similarity
    val df = Seq(
        (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
        (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
        (3L, Array(127.0f, -127.0f, 1.0f, -1.0f)))
      .toDF("id", "v")
    val q = Similarity.quantizeInt8(df, "v")
      .select($"id", $"v", $"v_qscale", $"v_qvec")
      .as[(Long, Array[Float], Double, Seq[Byte])].collect()
      .sortBy(_._1)
    q.foreach { case (id, v, scale, qv) =>
      assert(qv.length == v.length)
      assert(qv.forall(c => c >= -127 && c <= 127), s"id=$id out of range")
      // dequantized components within half-step of the original
      if (scale > 0) v.zip(qv).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
          s"id=$id component error beyond half-step")
      }
    }
    val zero = q.find(_._1 == 2L).get
    assert(zero._3 == 0.0 && zero._4.forall(_ == 0))
    // max-magnitude component quantizes to exactly +/-127
    val wide = q.find(_._1 == 3L).get
    assert(wide._4(0) == 127 && wide._4(1) == -127)
  }

  test("recommendedPlanes sizes bucket space to the corpus") {
    import graft.ml.Similarity.recommendedPlanes
    assert(recommendedPlanes(0) == 4) // degenerate floor
    assert(recommendedPlanes(1000) == 4) // fixture scale: floor holds
    assert(recommendedPlanes(10000) == 4) // exactly at target occupancy
    assert(recommendedPlanes(1000000) == 7) // 1e6/2^7 ≈ 7.8k ≤ 10k
    assert(recommendedPlanes(10000000000L) == 20) // 1e10/2^20 ≈ 9.5k
    assert(recommendedPlanes(Long.MaxValue) == 30) // ceiling
    // expected occupancy respects the target wherever the cap allows
    Seq(1L, 1000L, 1000000L, 10000000000L).foreach { n =>
      val p = recommendedPlanes(n)
      if (p < 30) assert(n.toDouble / math.pow(2, p) <= 10000.0, s"n=$n p=$p")
    }
    intercept[IllegalArgumentException] { recommendedPlanes(-1) }
  }

  test("cosineNearDupPairs bucket-cardinality guard actually fires") {
    // 60 rows, 4 planes → buckets of ~4-15 rows; maxBucketRows=1 must
    // make the job FAIL with the bucket message. This pins the guard
    // against ColumnPruning: an unused raise_error projection is deleted
    // by Catalyst and never fires (the bug this test was written for).
    val rnd = new scala.util.Random(5)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, numPlanes = 4, dim = 16, maxBucketRows = 1L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxBucketRows")),
      s"expected the bucket-guard raise_error, got: $ex")
  }

  test("cosineNearDupPairs output is unchanged by an in-plan (passing) guard") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val loose = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9, numPlanes = 4, dim = 16, maxBucketRows = 1000000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val tight = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9, numPlanes = 4, dim = 16, maxBucketRows = 60L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(loose == tight)
  }

  test("cosineNearDupPairs finds planted duplicate vectors") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // plant: vector 50 = tiny perturbation of vector 0
    val dup = (50L, base(0)._2.map(x => x + 0.001f))
    val df = (base :+ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 4, dim = 16)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 50L)))
  }
}
