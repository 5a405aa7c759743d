package graft.operators

import org.apache.spark.sql.functions.{col, greatest, least}

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

  test("flattenForest: a 21-deep chain resolves in 5 doubling rounds") {
    // parent = n-1; 2^5 = 32 >= depth 20, so 5 rounds must converge
    val parentOf = (0L to 20L)
      .map(n => (n, if (n == 0) None else Some(n - 1)))
      .toDF("node", "parent")
    val got = Graph.flattenForest(parentOf, "node", "parent", rounds = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (n <- 0L to 20L)
      assert(got(n) == ((0L, n)), s"node $n: ${got(n)}")
  }

  test("flattenForest: durable checkpoint mode is bit-identical to local") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val parentOf = (0L to 20L)
      .map(n => (n, if (n == 0) None else Some(n - 1)))
      .toDF("node", "parent")
    def run(ck: IterCheckpoint) =
      Graph.flattenForest(parentOf, "node", "parent", rounds = 5, ck)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val local = run(LocalCheckpoint)
    val durable = run(DurableCheckpoint(dir))
    assert(local == durable, "checkpoint strategy must not change results")
    // the durable rounds actually hit disk — that is what survives an
    // executor loss (localCheckpoint blocks die with their executor)
    assert(new java.io.File(s"$dir/round_0").exists() &&
      new java.io.File(s"$dir/round_5").exists(),
      "durable mode must write each round's state")
  }

  test("pageRank: durable checkpoint cadence preserves ranks exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-pr").toString
    val e = (1L to 60L).map(i => (i % 10, (i * 7) % 10))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val oneLazyPlan = Graph.pageRank(e, "src", "dst", iters = 4)
      .as[(Long, Double)].collect().toMap
    val durable = Graph.pageRank(e, "src", "dst", iters = 4,
        checkpointEvery = 2, checkpointer = DurableCheckpoint(dir))
      .as[(Long, Double)].collect().toMap
    assert(oneLazyPlan == durable, "checkpointing must not change ranks")
    assert(new java.io.File(s"$dir/round_2").exists(),
      "cadence 2 over 4 iters must persist the midpoint state")
    assert(!new java.io.File(s"$dir/round_4").exists(),
      "the final iteration is returned lazily, never checkpointed")
  }

  test("triangles: K4 yields its 4 canonical triples") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val got = Graph.triangles(e, "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: cycles without chords and stars have none") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    assert(Graph.triangles(square, "s", "d").count() == 0)
    val star = (2L to 9L).map(i => (1L, i)).toDF("s", "d")
    assert(Graph.triangles(star, "s", "d").count() == 0)
  }

  test("triangles: duplicate, reversed and self-loop edges canonicalize first") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L), (1L, 3L), (1L, 3L))
      .toDF("s", "d")
    val got = Graph.triangles(messy, "s", "d")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L)), s"got $got")
  }

  test("triangles: degree-ordered result equals the orientation-free 3-way join") {
    val raw = (0L until 400L).map(i => (i % 23, i % 19)).toDF("s", "d")
    val got = Graph.triangles(raw, "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    val e = raw.where($"s" =!= $"d")
      .select(least($"s", $"d").as("a"), greatest($"s", $"d").as("b"))
      .distinct()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a"), col("e1.b"), col("e2.b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"diff: ${got.diff(brute)} / ${brute.diff(got)}")
    assert(got.nonEmpty, "generator must actually produce triangles")
  }

  test("clusteringCoefficients: hand-computed values on a kite graph") {
    // triangle {1,2,3} + pendant 4 attached to 3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.clusteringCoefficients(e, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      // v3: degree 3, 1 triangle of C(3,2)=3 neighbor pairs -> 1/3
      3L -> ((3L, 1L, 0.333333)),
      4L -> ((1L, 0L, 0.0))), s"got $got")
  }

  test("clusteringCoefficients: complete graph all-1, star all-0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val ccK4 = Graph.clusteringCoefficients(k4, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
    assert(ccK4.forall(_._4 == 1.0), s"K4 must be all-1: ${ccK4.toSeq}")
    val star = (2L to 6L).map(i => (1L, i)).toDF("s", "d")
    val ccStar = Graph.clusteringCoefficients(star, "s", "d")
      .as[(Long, Long, Long, Double)].collect()
    assert(ccStar.forall(_._4 == 0.0), s"star must be all-0: ${ccStar.toSeq}")
  }

  test("kCore: lollipop cascade peels the tail round by round, core survives") {
    // K5 on 1..5 plus pendant path 5-6-7-8-9: at k=2 the path peels one
    // vertex per round from the free end (the cascade), K5 survives
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val path = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    val e = (k5 ++ path).toDF("s", "d")
    val converged = Graph.kCore(e, "s", "d", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(converged == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L),
      s"got $converged")
    // extra rounds after convergence change nothing
    val more = Graph.kCore(e, "s", "d", k = 2, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(more == converged)
    // a star has no 2-core at all: leaves peel, the center isolates
    val star = (2L to 9L).map(i => (1L, i)).toDF("s", "d")
    assert(Graph.kCore(star, "s", "d", k = 2, rounds = 8).count() == 0)
    intercept[IllegalArgumentException] {
      Graph.kCore(e, "s", "d", k = 0)
    }
  }

  test("flattenForest: a forest keeps trees separate, extra rounds harmless") {
    val parentOf = Seq(
      (10L, None), (11L, Some(10L)), (12L, Some(11L)),   // tree rooted at 10
      (20L, None), (21L, Some(20L))                      // tree rooted at 20
    ).toDF("node", "parent")
    val got = Graph.flattenForest(parentOf, "node", "parent", rounds = 8)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      10L -> ((10L, 0L)), 11L -> ((10L, 1L)), 12L -> ((10L, 2L)),
      20L -> ((20L, 0L)), 21L -> ((20L, 1L))))
  }

  test("labelPropagation: two triangles joined by a bridge split into min-label communities") {
    // triangle {1,2,3} - bridge 3-4 - triangle {4,5,6}
    val e = Seq((1L,2L),(2L,3L),(1L,3L),(3L,4L),(4L,5L),(5L,6L),(4L,6L)).toDF("u","v")
    val got = Graph.labelPropagation(e, "u", "v", rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L,2L,3L,4L,5L,6L))
    assert(got(1L) == got(2L) && got(2L) == got(3L), s"left triangle split: $got")
    assert(got(4L) == got(5L) && got(5L) == got(6L), s"right triangle split: $got")
    assert(got(1L) == 1L, s"community label must be its smallest member: $got")
  }

  test("labelPropagation: deterministic under repartitioning; guards") {
    val e = (1L to 60L).map(i => (i % 12, (i * 7) % 12)).toDF("u", "v")
    val a = Graph.labelPropagation(e, "u", "v", rounds = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.labelPropagation(e.repartition(13), "u", "v", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "partitioning changed the communities")
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(e, "u", "v", rounds = 0)
    }
  }
}
