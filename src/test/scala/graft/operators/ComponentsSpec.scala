package graft.operators

import graft.SparkSpec

/** `Components.connectedComponents` — large-star/small-star vs a
  * test-side union-find over the same edges. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    n.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chains, stars, cliques and isolated pairs land on the min id") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain → 1
      (10L, 11L), (10L, 12L), (10L, 13L), // star → 10
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle → 20
      (30L, 31L)) // pair → 30
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(run(edges) == unionFind(nodes, edges))
  }

  test("random graphs match union-find (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150 + trial * 50)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(run(edges) == unionFind(nodes, edges), s"trial $trial")
    }
  }

  test("empty and self-loop-only inputs yield no components") {
    assert(run(Seq.empty) == Map.empty)
    assert(run(Seq((7L, 7L))) == Map.empty)
  }

  test("dedupGroups counts members per representative") {
    val got = Components
      .dedupGroups(Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 10L -> 2L))
  }

  test("convergence signature has no edge-count overflow ceiling") {
    // the sums accumulate as decimal(38,0): a LONG sum of the
    // [0, 1e9)-bounded per-edge hashes would ANSI-overflow at ~9e9
    // edges — a reachable candidate-graph size at 100 TB. Assert the
    // overflow-free shape and that the signature discriminates edge sets.
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val e2 = Seq((1L, 2L), (2L, 4L)).toDF("u", "v")
    val s1 = Components.edgeSignature(e1)
    val s2 = Components.edgeSignature(e2)
    assert(s1._1 == 2L && s2._1 == 2L)
    assert(s1 != s2) // different edge sets, different sums
    assert(s1 == Components.edgeSignature(e1)) // deterministic
    // sums are exact decimals with scale 0 and 38-digit headroom
    assert(s1._2.scale == 0 && s1._3.scale == 0)
    val sumFields = e1.agg(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"u", $"v"),
          org.apache.spark.sql.functions.lit(1000000007L))
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))))
      .schema.fields
    assert(sumFields.head.dataType.asInstanceOf[
      org.apache.spark.sql.types.DecimalType].precision == 38)
  }
}
