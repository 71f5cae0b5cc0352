package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer assigns every corpus vector to a cell; a query probes only
  * its `nProbe` nearest cells. The candidate set shrinks from |corpus| to
  * ~|corpus|·nProbe/nCells — the classic IVF-Flat scheme (Jégou et al.,
  * product-quantization literature) on Spark primitives: MLlib KMeans for
  * training, a literal centroid table for probing, and a cell equi-join
  * for candidate generation.
  *
  * Scale notes: training samples the corpus (KMeans is iterative — do it
  * once, persist centers); assignment is one model.transform pass; search
  * is a broadcast-probe equi-join on cell id, never a cross product.
  */
object IvfIndex {

  final case class Model(centers: Array[Array[Double]]) {
    def nCells: Int = centers.length
  }

  /** Train the coarse quantizer (deterministic for a fixed seed). */
  def train(corpus: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 10): Model = {
    val feats = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray))
  }

  /** Nearest-cell id for a vector column (L2), via the literal centroid
    * table — pure expressions, broadcast-free, codegen-friendly. */
  def cellOf(vecCol: Column, model: Model): Column = {
    // a degenerate codebook (KMeans dedups identical training points to
    // fewer than k centers) must still assign: least() requires 2+ args
    if (model.nCells == 1) return lit(0)
    val dists = model.centers.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      struct(l2(vecCol, cLit).as("d2"), lit(i).as("cell"))
    }
    least(dists: _*).getField("cell")
  }

  /** The query side's probe list: its `nProbe` nearest cells. */
  def probeCells(vecCol: Column, model: Model, nProbe: Int): Column = {
    val dists = model.centers.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      struct(l2(vecCol, cLit).as("d2"), lit(i).as("cell"))
    }
    transform(slice(array_sort(array(dists: _*)), 1, nProbe),
      s => s.getField("cell"))
  }

  /** Literal-path cutoff: beyond this many cells the codebook no longer
    * belongs in the expression tree (plan size O(nCells·dim) breaks
    * codegen around ~1k cells) — assignment switches to a broadcast
    * centroid join. */
  val LiteralMaxCells = 64

  private def centroidDf(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("__cell", "__centroid")
  }

  /** Fused squared-L2 kernel (codegen): the HOF chain here is
    * CodegenFallback and evaluates once per row PER CENTROID —
    * interpreted-lambda cost × nCells on the assignment path. Identical
    * accumulation order and null/length semantics (VecL2Sq doc). */
  private def l2(a: Column, b: Column): Column =
    graft.functions.sketch.vec_l2sq(a, b)

  /** Nearest-cell assignment as a DataFrame transform. Small codebooks
    * (≤ `literalMax`) stay in the expression tree (cellOf — zero shuffle,
    * codegen'd); larger ones run a broadcast cross-probe join against the
    * centroid table and keep the winner per row — plan size O(1) in
    * nCells, the quantization work distributed instead of compiled. */
  def assignCells(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "cell", literalMax: Int = LiteralMaxCells): DataFrame =
    if (model.nCells <= literalMax)
      df.withColumn(outCol, cellOf(col(vecCol), model))
    else {
      val spark = df.sparkSession
      // the generated id correlates the probe branch with the join-back
      // branch of a self-join: materialize it ONCE (localCheckpoint) —
      // re-computing monotonically_increasing_id in each branch is only
      // deterministic if the whole upstream is (a shuffle retry or
      // round-robin repartition upstream would silently mis-join rows to
      // another row's cell assignment)
      val withId = df.withColumn("__rid", monotonically_increasing_id())
        .localCheckpoint()
      val best = withId.select(col("__rid"), col(vecCol).as("__v"))
        .crossJoin(broadcast(centroidDf(spark, model)))
        .select(col("__rid"),
          struct(l2(col("__v"), col("__centroid")).as("d2"),
            col("__cell").as("cell")).as("dc"))
        .groupBy(col("__rid"))
        .agg(min(col("dc")).getField("cell").as(outCol))
      withId.join(best, Seq("__rid")).drop("__rid")
    }

  /** nProbe-nearest-cells assignment as a DataFrame transform (query
    * side); same literal/broadcast strategy switch as assignCells. */
  def assignProbes(df: DataFrame, vecCol: String, model: Model, nProbe: Int,
      outCol: String = "cells", literalMax: Int = LiteralMaxCells): DataFrame =
    if (model.nCells <= literalMax)
      df.withColumn(outCol, probeCells(col(vecCol), model, nProbe))
    else {
      val spark = df.sparkSession
      // materialized once for the same reason as assignCells
      val withId = df.withColumn("__rid", monotonically_increasing_id())
        .localCheckpoint()
      val best = withId.select(col("__rid"), col(vecCol).as("__v"))
        .crossJoin(broadcast(centroidDf(spark, model)))
        .select(col("__rid"),
          struct(l2(col("__v"), col("__centroid")).as("d2"),
            col("__cell").as("cell")).as("dc"))
        .groupBy(col("__rid"))
        .agg(transform(slice(array_sort(collect_list(col("dc"))), 1, nProbe),
          s => s.getField("cell")).as(outCol))
      withId.join(best, Seq("__rid")).drop("__rid")
    }

  /** Cell-assigned, normalized corpus side: (corpus_id, cv, cell). */
  private def corpusSide(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    assignCells(
      corpus.select(col(idCol).as("corpus_id"),
        Similarity.normalize(col(vecCol)).as("cv"),
        col(vecCol).as("__vec")),
      "__vec", model).drop("__vec")

  /** Probe-exploded, normalized query side: (query_id, qv, cell). */
  private def probeSide(queries: DataFrame, idCol: String, vecCol: String,
      model: Model, nProbe: Int): DataFrame =
    assignProbes(
        queries.select(col(idCol).as("query_id"),
          Similarity.normalize(col(vecCol)).as("qv"),
          col(vecCol).as("__vec")),
        "__vec", model, nProbe).drop("__vec")
      .withColumn("cell", explode(col("cells"))).drop("cells")

  /** Shared candidate join + per-query ranking; `sim` is the scoring
    * expression over the joined row (exact dot or quantized dot). The
    * rank tail is Similarity.rankTopK — ONE definition of top-k
    * tie-breaking across the whole ANN family. */
  private def rankCandidates(assigned: DataFrame, probes: DataFrame,
      sim: Column, k: Int): DataFrame =
    Similarity.rankTopK(
      assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("corpus_id") =!= col("query_id"))
        .select(col("query_id"), col("corpus_id"), sim.as("sim")), k)

  /** IVF top-k cosine search: corpus assigned once, queries probe nProbe
    * cells, candidates ranked per query. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: Model, nProbe: Int): DataFrame =
    rankCandidates(
      corpusSide(corpus, idCol, vecCol, model),
      probeSide(queries, idCol, vecCol, model, nProbe),
      Similarity.dot(col("qv"), col("cv")), k)

  /** IVF top-k over an int8-quantized corpus — the two scale levers
    * composed: cell probing cuts CANDIDATE COUNT (~nProbe/nCells of the
    * corpus), quantization cuts BYTES PER CANDIDATE (4x), and both
    * multiply at 100 TB where the cell-join shuffle of corpus vectors
    * dominates. Scoring is the asymmetric quantized dot (full-precision
    * query); recall vs exact is gated in AnnRecallSpec, never assumed. */
  def topKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: Model, nProbe: Int): DataFrame =
    rankCandidates(
      // float vectors die before the cell join
      Similarity.quantizeInt8(
        corpusSide(corpus, idCol, vecCol, model), "cv").drop("cv"),
      probeSide(queries, idCol, vecCol, model, nProbe),
      Similarity.dotQuantized(col("cv_qscale"), col("cv_qvec"), col("qv")), k)
}
