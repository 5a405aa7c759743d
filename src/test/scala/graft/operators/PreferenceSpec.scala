package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bradley–Terry MM fit, comparison extraction, and the Wilson bound:
  * hand-computable fixed points, tie/boundary rules, partitioning
  * independence, and the small-sample rank inversion. */
class PreferenceSpec extends SparkSuite {
  import spark.implicits._

  test("adjacentComparisons: ordering, value duel, tie rule, same-type drop") {
    // one user, ordered by (ts, id): A(3) B(1) B(2) A(2) C(2)
    // duels: A-B -> A wins; B-B dropped; B-A -> value tie -> A (smaller);
    // A-C -> value tie -> A (smaller)
    val ev = Seq(
      (1L, 1L, "A", 3.0), (1L, 2L, "B", 1.0), (1L, 3L, "B", 2.0),
      (1L, 4L, "A", 2.0), (1L, 5L, "C", 2.0)
    ).toDF("user_id", "event_id", "item", "v")
      .select($"user_id", to_timestamp(lit("2024-01-01")).as("ts"),
        $"event_id", $"item", $"v")
    val comps = Preference.adjacentComparisons(
      ev, "user_id", "ts", "event_id", "item", "v")
      .select($"winner", $"loser")
      .as[(String, String)].collect().toSeq.sorted
    assert(comps == Seq(("A", "B"), ("A", "B"), ("A", "C")))
  }

  test("adjacentComparisons never crosses users") {
    val ev = Seq((1L, 1L, "A", 9.0), (2L, 2L, "B", 1.0))
      .toDF("user_id", "event_id", "item", "v")
      .select($"user_id", to_timestamp(lit("2024-01-01")).as("ts"),
        $"event_id", $"item", $"v")
    assert(Preference.adjacentComparisons(
      ev, "user_id", "ts", "event_id", "item", "v").count() == 0)
  }

  test("btStrengths two-item fixed point equals the closed-form MLE") {
    // A beats B 3x, B beats A 1x -> BT MLE p(A beats B) = 3/4; the MM
    // fixed point (reached at iteration 1 here) normalizes to (0.75, 0.25)
    val comps = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val got = Preference.btStrengths(comps, iters = 5)
      .select($"item", $"wins", $"games", $"strength")
      .as[(String, Long, Long, Double)].collect()
      .map { case (i, w, g, s) => i -> ((w, g, s)) }.toMap
    assert(got("A") == ((3L, 4L, 0.75)))
    assert(got("B") == ((1L, 4L, 0.25)))
  }

  test("btStrengths zero-win item takes strength 0 (MLE boundary)") {
    val comps = Seq(("A", "B"), ("A", "B")).toDF("winner", "loser")
    val got = Preference.btStrengths(comps, iters = 3)
      .select($"item", $"strength").as[(String, Double)].collect().toMap
    assert(got("A") == 1.0 && got("B") == 0.0)
  }

  test("btStrengths is partitioning-independent (decimal capture sums)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val comps = Preference.adjacentComparisons(
      ev, "user_id", "ts", "event_id", "event_type", "value")
    val a = Preference.btStrengths(comps, iters = 5).collect().toSet
    val b = Preference.btStrengths(comps.repartition(17), iters = 5)
      .collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("btStrengths strengths order by win quality, not raw wins alone") {
    // round-robin: A beats B 9/10, B beats C 9/10, A beats C 9/10 ->
    // strict order A > B > C
    val comps = (
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A"))
    ).toDF("winner", "loser")
    val s = Preference.btStrengths(comps, iters = 10)
      .select($"item", $"strength").as[(String, Double)].collect().toMap
    assert(s("A") > s("B") && s("B") > s("C"))
  }

  test("wilsonLowerBound: the 2-0 newcomer ranks below the 180-20 incumbent") {
    val df = Seq(("new", 2L, 2L), ("inc", 180L, 200L))
      .toDF("item", "wins", "games")
      .select($"item",
        ($"wins".cast("double") / $"games".cast("double")).as("p_hat"),
        Preference.wilsonLowerBound($"wins", $"games").as("lb"))
    val m = df.as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("new")._1 > m("inc")._1, "raw rate prefers the newcomer")
    assert(m("new")._2 < m("inc")._2, "wilson bound prefers the incumbent")
    assert(m("inc")._2 > 0.8 && m("inc")._2 < 0.9)
  }

  test("coherenceReport: rock-paper-scissors is one cyclic triad, flat fit") {
    // A>B, B>C, C>A (2x each): perfectly symmetric -> equal strengths,
    // p_bt = 0.5 on every pair, observed rates 1/0 -> abs_dev = 0.5
    val comps = (Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq.fill(2)(("C", "A"))).toDF("winner", "loser")
    val rows = Preference.coherenceReport(comps, iters = 5).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("p_bt") == 0.5, s"symmetric fit: $r")
      assert(r.getAs[Double]("abs_dev") == 0.5, s"cycle cannot fit a scale: $r")
      assert(r.getAs[Long]("n_decided_triads") == 1L, s"$r")
      assert(r.getAs[Long]("n_cyclic_triads") == 1L, s"$r")
    }
  }

  test("coherenceReport: transitive tournament has zero cyclic triads") {
    val comps = Seq(("A", "B"), ("B", "C"), ("A", "C")).toDF("winner", "loser")
    val r = Preference.coherenceReport(comps, iters = 5).collect().head
    assert(r.getAs[Long]("n_decided_triads") == 1L)
    assert(r.getAs[Long]("n_cyclic_triads") == 0L)
  }

  test("coherenceReport: tied pair decides no edge") {
    // A-B tied 1:1 -> pair undecided -> no triads at all
    val comps = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("A", "C"))
      .toDF("winner", "loser")
    val r = Preference.coherenceReport(comps, iters = 5).collect().head
    assert(r.getAs[Long]("n_decided_triads") == 0L,
      s"the tied A-B edge must break every triad: $r")
  }

  test("bootstrapStrengths: CI order, replicate cap, partitioning independence") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val comps = Preference.adjacentComparisons(
      ev, "user_id", "ts", "event_id", "event_type", "value")
    val a = Preference.bootstrapStrengths(comps, nBoot = 50, iters = 3)
      .collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"), s"$r")
      assert(r.getAs[Long]("n_reps") <= 50L, s"$r")
    }
    val b = Preference.bootstrapStrengths(comps.repartition(13),
      nBoot = 50, iters = 3).collect()
    assert(a.toSet == b.toSet, "the LCG draws must not depend on partitioning")
  }

  test("coherenceReport refuses an item count past the priced cap") {
    val comps = Seq(("A", "B"), ("B", "C"), ("C", "D")).toDF("winner", "loser")
    val e = intercept[Exception] {
      Preference.coherenceReport(comps, iters = 2, maxItems = 3)
    }
    assert(e.getMessage.contains("exceed maxItems"),
      s"expected the O(K^3) pricing refusal, got: ${e.getMessage}")
    // at the cap it runs
    assert(Preference.coherenceReport(comps, iters = 2, maxItems = 4)
      .count() == 3)
  }

  test("mergeMatrices: counter addition equals the from-scratch matrix") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def comps(df: org.apache.spark.sql.DataFrame) =
      Preference.adjacentComparisons(
        df, "user_id", "ts", "event_id", "event_type", "value")
    val m1 = Preference.countMatrix(comps(ev.where($"user_id" % 2 === 0)))
    val m2 = Preference.countMatrix(comps(ev.where($"user_id" % 2 === 1)))
    val merged = Preference.mergeMatrices(m1, m2)
    val full = Preference.countMatrix(comps(ev))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    assert(full.count() > 0)
  }

  test("wilsonLowerBound grows with evidence at a fixed rate") {
    val lbs = Seq((9L, 10L), (90L, 100L), (900L, 1000L))
      .toDF("w", "n").orderBy($"n")
      .select(Preference.wilsonLowerBound($"w", $"n"))
      .as[Double].collect().toList
    assert(lbs.sliding(2).forall { case List(a, b) => a < b; case _ => true })
    assert(lbs.forall(v => v > 0 && v < 0.9))
  }
}
