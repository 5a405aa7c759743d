package graft.operators

import graft.SparkSuite

class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  // 9 clean values 1..9 plus one 1000.0 outlier
  private def data = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
    .toDF("k", "x")

  test("winsorizedStats: hand-computed bounds, clamp, means on one group") {
    val r = RobustStats.winsorizedStats(data, Seq("k"), "x",
      lo = 0.1, hi = 0.9).collect().head
    val got = (r.getAs[Long]("n"), r.getAs[Double]("p_lo"),
      r.getAs[Double]("p_hi"), r.getAs[Double]("med"),
      r.getAs[Double]("mad"), r.getAs[Double]("mean_raw"),
      r.getAs[Double]("mean_wins"))
    // n=10: p10 = 1.9, p90 = 108.1 (lerp between 9 and 1000), med = 5.5
    // mad = median(|x-5.5|) = {0.5..4.5, 994.5} -> median 2.75? sorted
    // devs: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5 -> p50 = 2.5
    // mean_raw = 1045/10 = 104.5
    // winsorized: 1 -> 1.9, 1000 -> 108.1: (1.9+2..9+108.1)/10 = 15.4
    assert(got._1 == 10L)
    assert(got._2 == 1.9 && got._3 == 108.1 && got._4 == 5.5, s"got $got")
    assert(got._5 == 2.5, s"mad: $got")
    assert(got._6 == 104.5, s"mean_raw: $got")
    assert(got._7 == 15.4, s"mean_wins: $got")
  }

  test("winsorizedStats: outlier moves the raw mean, barely the winsorized one") {
    val clean = (1 to 9).map(v => ("g", v.toDouble)).toDF("k", "x")
    val cleanRow = RobustStats.winsorizedStats(clean, Seq("k"), "x",
      lo = 0.1, hi = 0.9).collect().head
    val dirtyRow = RobustStats.winsorizedStats(data, Seq("k"), "x",
      lo = 0.1, hi = 0.9).collect().head
    val rawShift = math.abs(
      dirtyRow.getAs[Double]("mean_raw") - cleanRow.getAs[Double]("mean_raw"))
    val winsShift = math.abs(
      dirtyRow.getAs[Double]("mean_wins") - cleanRow.getAs[Double]("mean_wins"))
    assert(rawShift > 5 * winsShift,
      s"winsorized mean must resist the outlier: raw $rawShift, wins $winsShift")
  }

  test("winsorizedStats: per-group independence") {
    val two = (data.as[(String, Double)].collect().toSeq ++
      (1 to 5).map(v => ("h", 100.0 * v))).toDF("k", "x")
    val got = RobustStats.winsorizedStats(two, Seq("k"), "x")
      .select($"k", $"n").as[(String, Long)].collect().toMap
    assert(got == Map("g" -> 10L, "h" -> 5L))
  }

  test("bootstrapMeanCi: band brackets the mean, shrinks with n, salt re-draws") {
    def fixture(n: Int) = (1 to n).map(i => (i.toLong, 100.0 + (i % 7)))
      .toDF("id", "x")
    val small = RobustStats.bootstrapMeanCi(fixture(60), "id", "x").head()
    val (n1, m1, lo1, hi1) = (small.getLong(0), small.getDouble(1),
      small.getDouble(2), small.getDouble(3))
    assert(n1 == 60L)
    assert(lo1 <= m1 && m1 <= hi1, s"band must bracket the mean: $small")
    assert(hi1 > lo1, "band must have width")
    val big = RobustStats.bootstrapMeanCi(fixture(6000), "id", "x").head()
    assert(big.getDouble(3) - big.getDouble(2) < (hi1 - lo1),
      s"100x rows must shrink the band: $big vs $small")
    val again = RobustStats.bootstrapMeanCi(fixture(60), "id", "x").head()
    assert(again == small, "same salt must reproduce the same band")
    val other = RobustStats
      .bootstrapMeanCi(fixture(60), "id", "x", salt = "bs2").head()
    assert(other.getDouble(2) != lo1 || other.getDouble(3) != hi1,
      "a rotated salt must re-draw the weights")
    intercept[IllegalArgumentException] {
      RobustStats.bootstrapMeanCi(fixture(5), "id", "x", replicates = 1)
    }
  }

  test("winsorizedStats: argument guards") {
    intercept[IllegalArgumentException] {
      RobustStats.winsorizedStats(data, Seq.empty, "x")
    }
    intercept[IllegalArgumentException] {
      RobustStats.winsorizedStats(data, Seq("k"), "x", lo = 0.6, hi = 0.4)
    }
    intercept[IllegalArgumentException] {
      RobustStats.winsorizedStats(data.withColumnRenamed("x", "med"),
        Seq("k"), "med")
    }
  }
}
