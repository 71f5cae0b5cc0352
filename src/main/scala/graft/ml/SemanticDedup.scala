package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with k-means, then
  * look for near-duplicates only WITHIN each cluster — pairwise cosine
  * is quadratic, but quadratic in the cluster size, not the corpus.
  * With C clusters the candidate work drops from N²/2 to ~N²/(2C); the
  * clusters are the blocking structure, playing the role LSH buckets
  * play in [[Similarity.cosineNearDupPairs]] but derived from the data
  * (k-means adapts to the embedding distribution where fixed random
  * hyperplanes cannot).
  *
  * Duplicate groups are closed with connected components and one
  * representative per group is kept — the smallest id, a deterministic
  * choice any external engine can recompute (the paper keeps a
  * low-centroid-similarity member; min-id preserves the dedup semantics
  * while making the selection oracle-checkable).
  *
  * RECALL note (same stance as the LSH path): a pair split across two
  * clusters is never compared. Near-identical vectors land in the same
  * cell except exactly on a Voronoi boundary, so at thresholds near 1
  * recall is ~1; lower thresholds trade recall for the C× cost cut —
  * that trade IS the SemDeDup design.
  *
  * 100 TB shape: assignment is a scan-stage projection (literal
  * centroids) or a broadcast join (big codebooks) via
  * [[IvfIndex.assignCells]]; the self-join shuffles 8-byte ids + the
  * cell key, vectors ride along once per side; a per-cluster
  * cardinality guard `raise_error`s in-plan instead of silently going
  * quadratic when nCells is too small for the corpus (the
  * cosineNearDupPairs guard, same Filter-predicate placement so
  * ColumnPruning cannot delete it).
  */
object SemanticDedup {

  /** Cluster count sized to the corpus — the SemDeDup recipe: cluster
    * count scales WITH the corpus so expected cluster size stays
    * bounded at `targetClusterRows` (the paper's own configuration
    * discipline; mirrors [[Similarity.recommendedPlanes]] for the LSH
    * path). The within-cluster pairing is O(n²) in ONE task, so the
    * target must stay small: 10⁴ rows ≈ 5·10⁷ dot products per
    * cluster — minutes of one core; 10⁶ would be days. The in-plan
    * cardinality guard backstops skewed clusters the expectation
    * argument cannot see. */
  def recommendedCells(corpusRows: Long,
      targetClusterRows: Long = 10000L): Int = {
    require(corpusRows >= 0 && targetClusterRows > 0,
      "corpusRows must be >= 0 and targetClusterRows > 0")
    val needed = math.ceil(
      math.max(1.0, corpusRows.toDouble / targetClusterRows)).toLong
    math.min(1 << 20, math.max(1L, needed)).toInt
  }

  /** Default per-cluster cardinality cap. 10⁵, NOT the 4·10⁶ the LSH
    * near-dup path uses: there the cap is a 400× backstop behind
    * `recommendedPlanes` sizing buckets to ~10⁴, while here it guards
    * quadratic SINGLE-TASK work directly — a 4M-row cluster would be
    * ~8·10¹² dot products in one task, dead long before the guard
    * mattered. 10⁵ rows ≈ 5·10⁹ products ≈ an hour of one core: slow
    * enough to notice, not so slow the job wedges silently. Size
    * `nCells` with [[recommendedCells]] so the cap never trips on a
    * well-configured run.
    *
    * BEHAVIOR CHANGE (deliberate, loud): this default was 4·10⁶
    * before the recalibration. A caller whose clusters sit in the
    * 10⁵–4·10⁶ range now FAILS the cardinality guard instead of
    * running days-long single tasks — re-size `nCells` via
    * [[recommendedCells]], or pass an explicit `maxClusterRows` to
    * `clusterPairs`/`keepFlags` to accept the quadratic cost
    * knowingly. */
  val DefaultMaxClusterRows: Long = 100L * 1000

  /** Train the clustering model on the normalized vectors (SemDeDup
    * clusters directions, not magnitudes). Thin wrapper so callers
    * cannot accidentally train on raw vectors and assign normalized
    * ones. */
  def train(df: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 10): IvfIndex.Model = {
    val normed = df.select(Similarity.normalize(col(vecCol)).as("__nv"))
    IvfIndex.train(normed, "__nv", nCells, seed, maxIter)
  }

  /** Within-cluster near-duplicate pairs:
    * (id1, id2, sim) with id1 < id2 and cosine >= threshold. */
  def clusterPairs(df: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, threshold: Double,
      maxClusterRows: Long = DefaultMaxClusterRows,
      stagingDir: Option[String] = None): DataFrame = {
    // materialize normalize+assign once: projection collapse would
    // inline the centroid argmin into both self-join branches.
    // stagingDir → written stage (the 100 TB shape: the cluster
    // assignment is an index artifact, recomputed only when the
    // codebook changes — cf. cosineNearDupPairs' staged buckets);
    // None → cache(), caller owns the lifecycle.
    val prepared = IvfIndex.assignCells(
      df.select(col(idCol).as("id"),
        Similarity.normalize(col(vecCol)).as("v")),
      "v", model, "cell")
    val assigned = stagingDir match {
      case Some(dir) => graft.operators.Staged.parquetStageOnce(
        prepared, dir + "/semdedup_cells")
      case None => prepared.cache()
    }
    // per-cluster cardinality guard — in a Filter predicate, evaluated
    // per row by construction (a projected-but-unread raise_error is
    // deleted by ColumnPruning and never fires)
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cluster_rows"))
    val clusterOk = when(col("cluster_rows") > maxClusterRows,
      raise_error(concat(
        lit("SemanticDedup: cluster "), col("cell").cast("string"),
        lit(" holds "), col("cluster_rows").cast("string"),
        lit(s" rows > maxClusterRows=$maxClusterRows — raise nCells" +
          " (shrinks clusters) or the cap"))).cast("boolean"))
      .otherwise(lit(true))
    val a = assigned.join(sizes, Seq("cell")).filter(clusterOk)
      .select(col("cell"), col("id").as("id1"), col("v").as("v1"))
    val b = assigned
      .select(col("cell"), col("id").as("id2"), col("v").as("v2"))
    a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        Similarity.dot(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Per-row keep decision: (id, kept). A row is kept iff it is not a
    * near-duplicate of a smaller-id row — i.e. it is the min-id
    * representative of its duplicate component, or a singleton. The
    * pairs close under connected components first, so a CHAIN of
    * near-duplicates (a~b~c with a≁c) still collapses to one kept
    * representative. */
  def keepFlags(df: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, threshold: Double,
      maxClusterRows: Long = DefaultMaxClusterRows,
      stagingDir: Option[String] = None): DataFrame = {
    val pairs = clusterPairs(df, idCol, vecCol, model, threshold,
      maxClusterRows, stagingDir)
    val comp = graft.operators.Components
      .connectedComponents(pairs, "id1", "id2")
      .select(col("node").as("id"), col("component"))
    df.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        (col("component").isNull || col("component") === col("id"))
          .as("kept"))
  }
}
