package graft.operators

import graft.SparkSuite

class SpectralSpec extends SparkSuite {
  import spark.implicits._

  test("powerIteration: dominant axis recovered on a hand-built matrix") {
    // mass concentrated on axis 1: top singular direction ~ (±1, ~0)
    val vecs = Seq(
      Array(3f, 0.1f), Array(3f, -0.1f), Array(2.9f, 0f), Array(0f, 1f)
    ).toDF("embedding")
    val got = Spectral.powerIteration(vecs, "embedding", dim = 2, iters = 8)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val v = got.map(_._2)
    assert(math.abs(v(0)) > 0.99, s"axis-1 weight must dominate: ${v.toSeq}")
    assert(math.abs(v(1)) < 0.15, s"axis-2 weight must be small: ${v.toSeq}")
    assert(math.abs(v(0) * v(0) + v(1) * v(1) - 1.0) < 1e-4, "unit norm")
    // lambda -> top eigenvalue of X^T X ~ sum of axis-1 squares ~ 26.4
    val lambda = got.head._3
    assert(lambda > 20 && lambda < 30, s"growth factor off: $lambda")
  }

  test("powerIteration: partitioning-independent on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = Spectral.powerIteration(emb, "embedding", dim = 64, iters = 2)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = Spectral.powerIteration(emb.repartition(13), "embedding",
        dim = 64, iters = 2)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, "decimal accumulation must make the trajectory exact")
  }

  test("powerIteration: direction stabilizes as iterations grow") {
    // real sf0.001 embeddings are near-isotropic (small spectral gap),
    // so convergence is slow — assert the drift SHRINKS, not a fixed bound
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def dir(it: Int): Array[Double] =
      Spectral.powerIteration(emb, "embedding", dim = 64, iters = it)
        .as[(Long, Double, Double)].collect().sortBy(_._1).map(_._2)
    def drift(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    val early = drift(dir(1), dir(2))
    val late = drift(dir(8), dir(9))
    assert(late < early,
      s"late drift $late must undercut early drift $early")
  }

  test("powerIteration: argument guards and wrong-width rows") {
    val vecs = Seq(Array(1f, 2f), Array(1f, 2f, 3f)).toDF("embedding")
    // the 3-wide row is filtered; the 2-wide row alone still iterates
    val got = Spectral.powerIteration(vecs, "embedding", dim = 2, iters = 2)
    assert(got.count() == 2L)
    intercept[IllegalArgumentException] {
      Spectral.powerIteration(vecs, "embedding", dim = 1)
    }
    intercept[IllegalArgumentException] {
      Spectral.powerIteration(vecs, "embedding", dim = 2, iters = 0)
    }
  }
}
