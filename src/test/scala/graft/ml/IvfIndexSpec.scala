package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // clustered corpus: 4 well-separated gaussian blobs in 8 dims
  private lazy val corpus = {
    val rnd = new scala.util.Random(5)
    (0L until 400L).map { i =>
      val blob = (i % 4).toInt
      val center = Array.tabulate(8)(d => if (d % 4 == blob) 10.0 else 0.0)
      (i, center.map(c => (c + rnd.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("cells partition the corpus; same-blob vectors share cells") {
    val model = IvfIndex.train(corpus, "embedding", nCells = 4)
    assert(model.nCells == 4)
    val assigned = corpus.select($"vec_id",
      IvfIndex.cellOf($"embedding", model).as("cell"))
    val cells = assigned.as[(Long, Int)].collect()
    assert(cells.map(_._2).toSet.size == 4)
    // vectors of one blob land in one cell (blobs are well separated)
    val byBlob = cells.groupBy(_._1 % 4).view.mapValues(_.map(_._2).toSet)
    assert(byBlob.values.forall(_.size == 1))
  }

  test("IVF top-k equals brute force when probing the right cell") {
    val model = IvfIndex.train(corpus, "embedding", nCells = 4)
    val queries = corpus.filter($"vec_id" < 4L) // one query per blob
    val ivf = IvfIndex.topK(corpus, queries, "vec_id", "embedding",
        k = 5, model, nProbe = 1)
      .select($"query_id", $"corpus_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 5)
      .select($"query_id", $"corpus_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    // same-blob neighbors dominate cosine, so nProbe=1 recalls them all
    assert(ivf == brute)
  }

  test("broadcast-join assignment equals the literal-expression assignment") {
    val model = IvfIndex.train(corpus, "embedding", nCells = 4)
    val lit = IvfIndex.assignCells(corpus, "embedding", model, "cell")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val bc = IvfIndex.assignCells(corpus, "embedding", model, "cell",
        literalMax = 0) // force the broadcast path on the same model
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(bc == lit)
    val litP = IvfIndex.assignProbes(corpus, "embedding", model, 2, "cells")
      .select($"vec_id", $"cells").as[(Long, Seq[Int])].collect().toMap
    val bcP = IvfIndex.assignProbes(corpus, "embedding", model, 2, "cells",
        literalMax = 0)
      .select($"vec_id", $"cells").as[(Long, Seq[Int])].collect().toMap
    assert(bcP == litP)
  }

  test("large codebook (nCells=256) keeps the plan compact and search working") {
    val model = IvfIndex.train(corpus, "embedding", nCells = 256, maxIter = 2)
    assert(model.nCells == 256)
    val assigned = IvfIndex.assignCells(corpus, "embedding", model)
    // the codebook must NOT be embedded in the plan: no least(...) over
    // 256 struct literals — plan stays O(1) in nCells via the join
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("least("), "literal codebook leaked into the plan")
    assert(plan.length < 50000, s"plan blew up: ${plan.length} chars")
    val queries = corpus.filter($"vec_id" < 2L)
    val got = IvfIndex.topK(corpus, queries, "vec_id", "embedding",
      k = 3, model, nProbe = 8)
    assert(got.groupBy($"query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 3))
  }

  test("probeCells returns nProbe distinct cells nearest-first") {
    val model = IvfIndex.train(corpus, "embedding", nCells = 4)
    val probes = corpus.filter($"vec_id" === 0L)
      .select(IvfIndex.probeCells($"embedding", model, 3).as("cells"))
      .as[Seq[Int]].head()
    assert(probes.length == 3)
    assert(probes.distinct.length == 3)
    // first probe is the vector's own cell
    val own = corpus.filter($"vec_id" === 0L)
      .select(IvfIndex.cellOf($"embedding", model)).as[Int].head()
    assert(probes.head == own)
  }
}
