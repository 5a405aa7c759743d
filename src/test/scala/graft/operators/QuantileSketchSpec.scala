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

  test("sketchW1: zero on self, point-mass shift recovered within alpha") {
    val a = Seq.fill(7)(10.0).toDF("v")
    val b = Seq.fill(3)(13.5).toDF("v")
    val ska = QuantileSketch.sketch(a, "v", Nil, alpha = 0.01)
    val skb = QuantileSketch.sketch(b, "v", Nil, alpha = 0.01)
    assert(QuantileSketch.sketchW1(ska, ska, alpha = 0.01)
      .head().getDouble(2) == 0.0)
    val r = QuantileSketch.sketchW1(ska, skb, alpha = 0.01).head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L)
    // representatives displace each point by <= alpha relative error,
    // so the sketch W1 of a 3.5 shift at scale ~13.5 is within ~0.3
    assert(math.abs(r.getDouble(2) - 3.5) < 0.3, s"got ${r.getDouble(2)}")
  }

  test("sketchW1 tracks the exact W1 within the alpha displacement bound") {
    // spread distribution across many buckets
    val a = spark.range(1, 2000).selectExpr("CAST(id AS DOUBLE) AS v")
    val b = spark.range(1, 2000).selectExpr("CAST(id AS DOUBLE) * 1.2 AS v")
    val exact = Drift.wasserstein1(a, b, "v").head().getDouble(2)
    val sk = QuantileSketch.sketchW1(
      QuantileSketch.sketch(a, "v", Nil, alpha = 0.01),
      QuantileSketch.sketch(b, "v", Nil, alpha = 0.01), alpha = 0.01).head().getDouble(2)
    // |W1_sketch - W1_exact| <= alpha * (E|X_a| + E|X_b|) ~ 0.01 * 2200
    assert(math.abs(sk - exact) <= 0.01 * 2300,
      s"sketch $sk vs exact $exact")
    assert(sk > 0.8 * exact && sk < 1.2 * exact, s"sketch $sk vs exact $exact")
  }

  test("sketchDriftReport: per-group == ungrouped per slice; stepless and one-sided groups") {
    val a = (Seq.fill(20)(("g1", 5.0)) ++ Seq.fill(10)(("g2", 50.0)) ++
      Seq.fill(4)(("g3", 7.0)) ++ Seq.fill(3)(("only_a", 9.0))).toDF("k", "v")
    val b = (Seq.fill(15)(("g1", 8.0)) ++ Seq.fill(12)(("g2", 50.0)) ++
      Seq.fill(6)(("g3", 7.0))).toDF("k", "v")
    val ska = QuantileSketch.sketch(a, "v", Seq("k"))
    val skb = QuantileSketch.sketch(b, "v", Seq("k"))
    val rows = QuantileSketch.sketchDriftReport(ska, skb, Seq("k")).collect()
    val grouped = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ks = rows.map(r => r.getString(0) -> r.getDouble(4)).toMap
    // one-sided group dropped; both-sided groups present
    assert(grouped.keySet == Set("g1", "g2", "g3"), s"got ${grouped.keySet}")
    // g2/g3: identical single-bucket mass on both sides -> 0, row kept
    assert(grouped("g2") == ((10L, 12L, 0.0)) && grouped("g3") == ((4L, 6L, 0.0)))
    // ks readout: completely separated buckets -> 1.0; identical -> 0.0
    assert(ks("g1") == 1.0 && ks("g2") == 0.0 && ks("g3") == 0.0, s"$ks")
    // psi: no shared bucket -> NULL (infinite PSI must not read as 0);
    // identical placement -> 0.0
    val psi = rows.map(r =>
      r.getString(0) -> (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(psi("g1").isEmpty, s"disjoint supports must report NULL psi: $psi")
    assert(psi("g2").contains(0.0) && psi("g3").contains(0.0), s"$psi")
    // per-group value equals the ungrouped computation on that slice
    for (g <- Seq("g1", "g2", "g3")) {
      val solo = QuantileSketch.sketchW1(
        QuantileSketch.sketch(a.where($"k" === g), "v", Nil),
        QuantileSketch.sketch(b.where($"k" === g), "v", Nil)).head()
      assert(grouped(g) == ((solo.getLong(0), solo.getLong(1), solo.getDouble(2))),
        s"group $g: ${grouped(g)} vs solo $solo")
    }
  }

  test("sketchW1 guards: empty sketch raises the contract error, not an NPE") {
    val sk = QuantileSketch.sketch(Seq(1.0).toDF("v"), "v", Nil)
    val empty = sk.where(lit(false))
    val e = intercept[IllegalArgumentException] {
      QuantileSketch.sketchW1(sk, empty)
    }
    assert(e.getMessage.contains("carry mass"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      QuantileSketch.sketchW1(empty, empty)
    }
    assert(e2.getMessage.contains("carry mass"), e2.getMessage)
  }

  test("sketchW1 is merge-invariant: per-shard merged sketches == one-pass") {
    val full = spark.range(1, 500).selectExpr("CAST(id AS DOUBLE) * 3.7 AS v")
    val s1 = QuantileSketch.sketch(full.where($"v" < 600), "v", Nil, alpha = 0.02)
    val s2 = QuantileSketch.sketch(full.where($"v" >= 600), "v", Nil, alpha = 0.02)
    val b = QuantileSketch.sketch(
      spark.range(1, 300).selectExpr("CAST(id AS DOUBLE) * 5.1 AS v"), "v", Nil, alpha = 0.02)
    val merged = QuantileSketch.merge(s1.unionByName(s2), Nil)
    val onePass = QuantileSketch.sketch(full, "v", Nil, alpha = 0.02)
    val w1m = QuantileSketch.sketchW1(merged, b, alpha = 0.02).head().getDouble(2)
    val w1o = QuantileSketch.sketchW1(onePass, b, alpha = 0.02).head().getDouble(2)
    assert(w1m == w1o, s"merged $w1m != one-pass $w1o")
  }
}
