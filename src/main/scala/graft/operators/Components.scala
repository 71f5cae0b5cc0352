package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash banding, embedding
  * buckets) into dedup GROUPS: every document in a component is a
  * near-duplicate of some chain of others, and the component's min id
  * is the canonical representative to keep.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shuffle-friendly formulation. Each round is two
  * aggregate+join passes over the current edge set; the edge set
  * monotonically bends toward a star per component and converges in
  * O(log n) rounds. No vertex state lives on the driver: rounds are
  * whole DataFrame jobs, lineage is cut per round with localCheckpoint
  * (same device as IvfIndex's training loop), and the convergence test
  * is a two-value aggregate (count + order-insensitive hash), never a
  * collect of edges.
  *
  * At 100 TB the per-round cost is two hash-shuffles keyed by node id
  * over the CURRENT edge set, which shrinks geometrically after the
  * first rounds; the near-dup graphs this serves (banded candidate
  * pairs) are orders of magnitude smaller than the corpus itself.
  */
object Components {

  /** (node, component) for every node that appears in `edges`;
    * `component` is the smallest node id reachable. Nodes are cast to
    * long (ids). Self-loops are ignored. Fails loudly if `maxIter`
    * rounds don't converge rather than returning a partial merge. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // materialize-with-signature: ONE Spark action per round — the
    // convergence signature rides the localCheckpoint's materialization
    // job as an Observation instead of a second aggregate action over
    // the checkpointed data. localCheckpoint (not cache) stays load-
    // bearing: it truncates the LOGICAL plan, and each round's plan
    // embeds the previous round's twice (the bidir union), so without
    // truncation plan size — and the canonicalization every action pays
    // — grows exponentially with rounds. At bench scale the loop's wall
    // was per-action scheduling/planning, not the (tiny, shrinking)
    // edge data; this halves the actions per round.
    def materialize(df: DataFrame)
        : (DataFrame, (Long, java.math.BigDecimal, java.math.BigDecimal)) = {
      val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
      val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
      val obs = org.apache.spark.sql.Observation()
      val cp = df.observe(obs,
          count(lit(1)).as("n"),
          coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))
            .cast(dec)), zero).as("h1"),
          coalesce(sum(pmod(xxhash64(lit(7L), col("u"), col("v")),
            lit(999999937L)).cast(dec)), zero).as("h2"))
        .localCheckpoint()
      val m = obs.get
      (cp, (m("n").asInstanceOf[Long],
        m("h1").asInstanceOf[java.math.BigDecimal],
        m("h2").asInstanceOf[java.math.BigDecimal]))
    }
    var (e, sig) = materialize(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct())
    var iter = 0
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      // large-star: every neighbor LARGER than u links to u's local min
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(min(col("v")).as("mv"))
      val ls = bidir.join(mins, "u")
        .withColumn("m", least(col("mv"), col("u")))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: orient (larger → smaller); every smaller neighbor
      // and u itself link to the local min
      val dir = ls.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins2 = dir.groupBy("u").agg(min(col("v")).as("m"))
      val joined = dir.join(mins2, "u")
      val (ss, next) = materialize(joined.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .distinct())
      converged = next == sig
      sig = next
      e = ss
      iter += 1
    }
    if (!converged) sys.error(
      s"connectedComponents: no fixpoint after $maxIter rounds " +
        s"(${sig._1} edges) — raise maxIter")
    // fixpoint is a star per component: u → min, plus the root itself
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")).distinct())
      .distinct()
  }

  /** Order-insensitive signature of an edge set: converged when a round
    * is a no-op. TWO independently-seeded hash sums + the count — a
    * false convergence needs a simultaneous collision in both 60-bit
    * sums on the same count (~1e-36 per round), vs ~1e-9 for one sum.
    * The sums accumulate as decimal(38,0), so there is NO overflow
    * ceiling on the edge count (a long sum of the [0, 1e9)-bounded
    * per-edge hashes would hit ANSI overflow at ~9e9 edges — within
    * reach of a 100 TB candidate graph). */
  private[operators] def edgeSignature(df: DataFrame)
      : (Long, java.math.BigDecimal, java.math.BigDecimal) = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
    val r = df.agg(count(lit(1)),
      coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))
        .cast(dec)), zero),
      coalesce(sum(pmod(xxhash64(lit(7L), col("u"), col("v")),
        lit(999999937L)).cast(dec)), zero)).head()
    (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
  }

  /** Dedup-group summary over near-dup pairs: one row per component —
    * the representative (min id), member count, and the members kept
    * for audit. The "which rows do I drop" companion: every node with
    * node =!= component is a near-duplicate of the kept representative.
    *
    * `connectedComponents`' default maxIter=25 covers component
    * diameters to ~2^25 (rounds roughly halve the star depth); raising
    * it is safe — each extra round is two shuffles over an
    * already-shrunken edge set — but a graph that NEEDS it usually
    * signals an over-permissive candidate generator (band thresholds
    * admitting everything), which is the thing to fix. */
  def dedupGroups(pairs: DataFrame, idCol1: String, idCol2: String): DataFrame =
    connectedComponents(pairs, idCol1, idCol2)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
}
