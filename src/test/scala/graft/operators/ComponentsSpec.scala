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
}
