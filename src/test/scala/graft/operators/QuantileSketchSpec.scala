package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  private val alpha = 0.01

  test("relative-error guarantee: every readout within alpha of the exact order statistic") {
    val values = (1 to 5000).map(i => (i.toLong, math.exp(i / 500.0) * (1 + (i % 7))))
    val df = values.toDF("id", "v").repartition(8)
    val sk = QuantileSketch.sketch(df, "v", Seq.empty, alpha)
    val got = QuantileSketch.quantiles(sk, Seq.empty, Seq(0.1, 0.5, 0.9, 0.99), alpha)
      .as[(Double, Double)].collect().toMap
    val sorted = values.map(_._2).sorted
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val exact = sorted(math.floor(q * (sorted.size - 1)).toInt)
      val est = got(q)
      assert(math.abs(est - exact) / exact <= alpha + 1e-9,
        s"q=$q: est $est vs exact $exact breaks the $alpha bound")
    }
  }

  test("merge == from-scratch bit-for-bit; partitioning cannot move a bucket") {
    val df = (1 to 4000).map(i => ((i % 3).toString, i * 1.5 + 0.25)).toDF("g", "v")
    val whole = QuantileSketch.sketch(df, "v", Seq("g"), alpha)
    val a = QuantileSketch.sketch(df.where(col("v") < 3000), "v", Seq("g"), alpha)
    val b = QuantileSketch.sketch(df.where(col("v") >= 3000), "v", Seq("g"), alpha)
    val merged = QuantileSketch.merge(a.unionByName(b), Seq("g"))
    val w = whole.collect().map(r => (r.getString(0), Option(r.get(1))) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getString(0), Option(r.get(1))) -> r.getLong(2)).toMap
    assert(w == m, "merged sketch must equal the from-scratch sketch exactly")
    val repart = QuantileSketch.sketch(df.repartition(17), "v", Seq("g"), alpha)
      .collect().map(r => (r.getString(0), Option(r.get(1))) -> r.getLong(2)).toMap
    assert(repart == w, "bucket of a value is a pure function of the value")
  }

  test("sketchWeighted: weight mass moves the percentile; buckets stay value-pure") {
    // 100 short docs (len 10) each weighing 10 tokens vs 5 long docs
    // (len 1000) each weighing 1000: by rows the median is short, by
    // token mass it is long
    val df = ((1 to 100).map(i => (i.toLong, 10.0, 10L)) ++
      (101 to 105).map(i => (i.toLong, 1000.0, 1000L))).toDF("id", "v", "w")
    val rowP50 = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, "v", Seq.empty, alpha), Seq.empty, Seq(0.5), alpha)
      .select("est").head.getDouble(0)
    val massP50 = QuantileSketch.quantiles(
      QuantileSketch.sketchWeighted(df, "v", "w", Seq.empty, alpha),
      Seq.empty, Seq(0.5), alpha)
      .select("est").head.getDouble(0)
    assert(math.abs(rowP50 - 10.0) / 10.0 <= alpha + 1e-9, s"row median $rowP50")
    assert(math.abs(massP50 - 1000.0) / 1000.0 <= alpha + 1e-9,
      s"token-mass median must sit in the long docs: $massP50")
    // weighted sketch with unit weights == unweighted sketch exactly
    val unit = QuantileSketch.sketchWeighted(
      df.withColumn("one", lit(1L)), "v", "one", Seq.empty, alpha)
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    val plain = QuantileSketch.sketch(df, "v", Seq.empty, alpha)
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(unit == plain)
    intercept[Exception] {
      QuantileSketch.sketchWeighted(Seq((1.0, -1L)).toDF("v", "w"),
        "v", "w", Seq.empty, alpha).collect()
    }
  }

  test("zeros ride the reserved bucket; negatives fail fast; guards") {
    val df = Seq(0.0, 0.0, 1.0, 10.0).toDF("v")
    val sk = QuantileSketch.sketch(df, "v", Seq.empty, alpha)
    val zeroCnt = sk.where(col("bucket").isNull).select("cnt").head.getLong(0)
    assert(zeroCnt == 2L)
    // p0 must read the zero bucket back as 0.0
    val p0 = QuantileSketch.quantiles(sk, Seq.empty, Seq(0.0), alpha)
      .select("est").head.getDouble(0)
    assert(p0 == 0.0)
    val neg = Seq(-1.0).toDF("v")
    val e = intercept[Exception] {
      QuantileSketch.sketch(neg, "v", Seq.empty, alpha).collect()
    }
    assert(e.getMessage.contains("negative") || e.getCause != null)
    intercept[IllegalArgumentException] {
      QuantileSketch.sketch(df, "v", Seq.empty, alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.quantiles(sk, Seq.empty, Seq(1.5), alpha)
    }
  }
}
