package graft.operators

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("two-node cycle: ranks stay at the uniform fixed point") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    // symmetric cycle: 0.5 is the fixed point from the uniform start
    assert(got == Map(1L -> 0.5, 2L -> 0.5), s"got $got")
  }

  test("star graph: the hub outranks the leaves, closed-form after 1 iter") {
    // 3 leaves -> hub, 1 iteration: hub = 0.15/4 + 0.85 * 3 * (1/4);
    // leaves have no in-edges: 0.15/4
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 1)
      .as[(Long, Double)].collect().toMap
    val teleport = 0.15 / 4
    assert(math.abs(got(0L) - (teleport + 0.85 * 3 * 0.25)) < 1e-6, s"hub: $got")
    for (leaf <- Seq(1L, 2L, 3L))
      assert(math.abs(got(leaf) - teleport) < 1e-6, s"leaf $leaf: $got")
  }

  test("deterministic across partitioning and repeated runs") {
    val e = (1L to 60L).map(i => (i % 10, (i * 7) % 10))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val a = Graph.pageRank(e, "src", "dst").as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(e.repartition(7), "src", "dst")
      .as[(Long, Double)].collect().toMap
    assert(a == b, "rank must not depend on partitioning")
  }

  test("empty graph is rejected") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst") }
  }
}
