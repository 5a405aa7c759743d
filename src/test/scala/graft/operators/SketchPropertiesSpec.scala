package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** ScalaCheck properties for the sketch/filter operators added in round 5:
  * the count-min one-sided bound and shard additivity, the bloom
  * semi-join's exactness, and the KS statistic's bounds/symmetry — over
  * generated multisets (deterministically sampled with fixed seeds, same
  * offline-cache convention as MergePropertiesSpec).
  */
class SketchPropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val keysGen: Gen[List[Long]] = for {
    n <- Gen.chooseNum(5, 120)
    ks <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L)) // negatives: pmod paths
  } yield ks

  private def sample(seed: Long): List[Long] =
    keysGen.pureApply(Gen.Parameters.default, Seed(seed))

  private val Trials = 6

  private def df(rows: List[Long]): DataFrame = rows.toDF("key")

  test("property: count-min estimate >= exact for EVERY key, every shape") {
    for (i <- 0 until Trials) {
      val rows = sample(i)
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = CountMin.build(df(rows), "key", depth = 3, width = 8)
      val est = CountMin.estimate(sk, df(rows.distinct), "key", depth = 3, width = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"trial $i key $k: est ${est(k)} < exact $c")
      }
    }
  }

  test("property: count-min shard merge == one-pass build (any split point)") {
    for (i <- 0 until Trials) {
      val rows = sample(i + 50)
      val (l, r) = rows.splitAt(rows.size / 2)
      val merged = CountMin.merge(
        CountMin.build(df(l), "key", 3, 8), CountMin.build(df(r), "key", 3, 8))
      val direct = CountMin.build(df(rows), "key", 3, 8)
      assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
        s"trial $i")
    }
  }

  test("property: bloomSemiJoin == plain semi-join for any keys and any filter size") {
    for (i <- 0 until Trials) {
      val large = df(sample(i + 200))
      val small = df(sample(i + 300))
      val bits = if (i % 2 == 0) 64 else 1 << 12 // saturated and roomy
      val viaBloom = BloomJoin.bloomSemiJoin(large, "key", small, "key",
        numBits = bits, numHashes = 3)
      val plain = large.join(small.select($"key").distinct(), Seq("key"), "left_semi")
      assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty,
        s"trial $i bits=$bits")
    }
  }

  test("property: joinSizeEstimate >= exact always; == exact at collision-free width") {
    for (i <- 0 until Trials) {
      val a = df(sample(i + 400))
      val b = df(sample(i + 500))
      val exact = a.join(b, Seq("key")).count()
      val tight = CountMin.joinSizeEstimate(a, "key", b, "key",
        depth = 3, width = 8).head().getLong(2)
      assert(tight >= exact, s"trial $i: tight $tight < exact $exact")
      val wide = CountMin.joinSizeEstimate(a, "key", b, "key",
        depth = 2, width = 1 << 16, withExact = true).head()
      assert(wide.getLong(2) == exact && wide.getLong(3) == exact,
        s"trial $i: wide ${wide.getLong(2)} != exact $exact")
    }
  }

  test("property: W1 is a metric on samples — symmetric, 0 iff same multiset shape, triangle") {
    def vdf(rows: List[Long]): DataFrame =
      rows.map(k => (k % 37).toDouble + 40.0).toDF("v") // positive, DDSketch-safe
    for (i <- 0 until Trials) {
      val (a, b, c) = (vdf(sample(i + 600)), vdf(sample(i + 700)), vdf(sample(i + 800)))
      val ab = Drift.wasserstein1(a, b, "v").head().getDouble(2)
      val ba = Drift.wasserstein1(b, a, "v").head().getDouble(2)
      val ac = Drift.wasserstein1(a, c, "v").head().getDouble(2)
      val cb = Drift.wasserstein1(c, b, "v").head().getDouble(2)
      assert(ab == ba, s"trial $i: W1 not symmetric: $ab vs $ba")
      assert(ab >= 0.0 && Drift.wasserstein1(a, a, "v").head().getDouble(2) == 0.0)
      // triangle inequality, slack 1e-5 for the 6dp term rounding
      assert(ab <= ac + cb + 1e-5, s"trial $i: triangle broken: $ab > $ac + $cb")
      // the sketch-space W1 obeys the same symmetry on sketched sides
      val ska = QuantileSketch.sketch(a, "v", Nil)
      val skb = QuantileSketch.sketch(b, "v", Nil)
      val sab = QuantileSketch.sketchW1(ska, skb).head().getDouble(2)
      val sba = QuantileSketch.sketchW1(skb, ska).head().getDouble(2)
      assert(sab == sba, s"trial $i: sketch W1 not symmetric")
      // sketch displaces each value by <= alpha relative: values ~<77
      assert(math.abs(sab - ab) <= 0.01 * 2 * 77 + 1e-6,
        s"trial $i: sketch W1 $sab too far from exact $ab")
    }
  }

  test("property: KS statistic is in [0,1], symmetric, 0 on identical samples") {
    for (i <- 0 until Trials) {
      val a = df(sample(i + 400)).select($"key".cast("double").as("v"))
      val b = df(sample(i + 500)).select($"key".cast("double").as("v"))
      val ab = Drift.ksStatistic(a, b, "v").head()
      val ba = Drift.ksStatistic(b, a, "v").head()
      assert(ab.getDouble(3) >= 0.0 && ab.getDouble(3) <= 1.0, s"trial $i: $ab")
      assert(ab.getLong(2) == ba.getLong(2), s"trial $i: |gap| must be symmetric")
      val aa = Drift.ksStatistic(a, a, "v").head()
      assert(aa.getLong(2) == 0L, s"trial $i: identical samples must give 0")
    }
  }
}
