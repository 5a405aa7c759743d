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
