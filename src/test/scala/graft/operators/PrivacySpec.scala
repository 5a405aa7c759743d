package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PrivacySpec extends SparkSuite {
  import spark.implicits._

  // 3 rows share (US, A); (US, B) and (CA, A) are singletons
  private def people = Seq(
    (1L, "US", "A", 10.0), (2L, "US", "A", 11.0), (3L, "US", "A", 12.0),
    (4L, "US", "B", 13.0), (5L, "CA", "A", 14.0)
  ).toDF("id", "country", "segment", "score")

  test("laplaceNoisyCounts: deterministic per salt, exact count never released") {
    val out1 = Privacy.laplaceNoisyCounts(people, Seq("country"), epsilon = 1.0)
    assert(out1.columns.toSeq == Seq("country", "n_noisy"),
      "only the group key and the noisy count may leave")
    val a = out1.as[(String, Double)].collect().toMap
    val b = Privacy.laplaceNoisyCounts(people, Seq("country"), epsilon = 1.0)
      .as[(String, Double)].collect().toMap
    assert(a == b, "same salt must reproduce the same release")
    val c = Privacy.laplaceNoisyCounts(people, Seq("country"),
      epsilon = 1.0, salt = "other").as[(String, Double)].collect().toMap
    assert(a != c, "a rotated salt must re-draw the noise")
    // noise is real: at least one group must not equal its exact count
    assert(a("US") != 4.0 || a("CA") != 1.0, s"no noise applied: $a")
    assert(a.values.forall(v => v >= 0.0 && v.isFinite), s"clamp failed: $a")
  }

  test("laplaceNoisyCounts: tighter epsilon means larger expected noise") {
    // with the same uniforms, noise magnitude scales exactly 1/epsilon
    val wide = Privacy.laplaceNoisyCounts(people, Seq("country"), epsilon = 0.1)
      .as[(String, Double)].collect().toMap
    val narrow = Privacy.laplaceNoisyCounts(people, Seq("country"), epsilon = 10.0)
      .as[(String, Double)].collect().toMap
    val exact = Map("US" -> 4.0, "CA" -> 1.0)
    val devWide = exact.keys.map(k => math.abs(wide(k) - exact(k))).sum
    val devNarrow = exact.keys.map(k => math.abs(narrow(k) - exact(k))).sum
    assert(devWide > devNarrow,
      s"eps=0.1 must perturb more than eps=10: $devWide vs $devNarrow")
  }

  test("laplaceNoisyCounts: NULL groups get real noise; delimiter values cannot share a seed") {
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "US")).toDF("id", "country")
    val rel = Privacy.laplaceNoisyCounts(withNull, Seq("country"), epsilon = 1.0)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(rel.keySet == Set(None, Some("US")))
    // the NULL group's release must be noised, not a silent noiseless 0.0
    assert(rel(None) != 2.0 && rel(None) != 0.0, s"NULL group released un-noised: $rel")
    // ("a|", "b") and ("a", "|b") concatenate identically without the
    // length-prefix encoding — they must draw DIFFERENT noise
    val tricky = Seq((1L, "a|", "b"), (2L, "a", "|b")).toDF("id", "g1", "g2")
    val draws = Privacy.laplaceNoisyCounts(tricky, Seq("g1", "g2"), epsilon = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(draws(("a|", "b")) != draws(("a", "|b")),
      s"seed collision across distinct groups: $draws")
  }

  test("laplaceNoisyMean: deterministic, clamp bounds the release, exact stats never leave") {
    val scores = Seq((1L, "US", 10.0), (2L, "US", 12.0), (3L, "US", 1e9),
      (4L, "CA", -50.0)).toDF("id", "country", "v")
    val rel = Privacy.laplaceNoisyMean(scores, Seq("country"), "v",
      lo = 0.0, hi = 100.0, epsilon = 1.0)
    assert(rel.columns.toSeq == Seq("country", "n_noisy", "mean_noisy"),
      "only the key and noisy aggregates may leave")
    val a = rel.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = Privacy.laplaceNoisyMean(scores, Seq("country"), "v",
      lo = 0.0, hi = 100.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a == b, "same salt must reproduce the release")
    // the 1e9 outlier is clamped to 100: even with noise the US mean
    // cannot be dragged anywhere near the unclamped mean (~3.3e8)
    assert(math.abs(a("US")._2) < 1e6, s"clamp failed to bound the outlier: $a")
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisyMean(scores, Seq("country"), "v", 10.0, 10.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisyMean(scores, Seq("country"), "v", 0.0, 100.0, 0.0)
    }
  }

  test("laplaceNoisyCounts: argument guards") {
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisyCounts(people, Seq.empty, epsilon = 1.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisyCounts(people, Seq("country"), epsilon = 0.0)
    }
  }

  test("kAnonymityAudit counts each quasi combination and flags those below k") {
    val audit = Privacy.kAnonymityAudit(people, Seq("country", "segment"), 3)
      .orderBy("country", "segment").collect()
    assert(audit.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq(("CA", "A", 1L, true), ("US", "A", 3L, false), ("US", "B", 1L, true)))
  }

  test("suppressBelowK nulls exactly the risky groups' quasi columns, nothing else") {
    val out = Privacy.suppressBelowK(people, Seq("country", "segment"), 3)
      .orderBy("id").collect()
    // the (US, A) trio keeps its values
    (0 until 3).foreach { i =>
      assert(out(i).getString(1) == "US" && out(i).getString(2) == "A")
      assert(!out(i).getBoolean(4))
    }
    // singletons are suppressed: quasi cols null, other cols intact
    Seq(3, 4).foreach { i =>
      assert(out(i).isNullAt(1) && out(i).isNullAt(2), s"row $i must be suppressed")
      assert(out(i).getBoolean(4))
      assert(!out(i).isNullAt(3), "non-quasi columns must survive suppression")
    }
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a small NULL quasi combination is suppressed too (null-safe probe)") {
    val withNull = people.unionByName(
      Seq((6L, null.asInstanceOf[String], "A", 15.0)).toDF("id", "country", "segment", "score"))
    val out = Privacy.suppressBelowK(withNull, Seq("country", "segment"), 3)
    val row6 = out.where(col("id") === 6L).collect().head
    assert(row6.getBoolean(4), "the lone (NULL, A) group is below k and must be flagged")
    assert(row6.isNullAt(1) && row6.isNullAt(2))
    assert(out.where(col("suppressed")).count() == 3)
  }

  test("a NULL combination at or above k is already anonymous and kept") {
    val nulls = (10L to 13L).map(i => (i, null.asInstanceOf[String], "Z", 1.0))
      .toDF("id", "country", "segment", "score")
    val out = Privacy.suppressBelowK(people.unionByName(nulls), Seq("country", "segment"), 3)
    assert(out.where(col("id") >= 10L && !col("suppressed")).count() == 4)
    assert(out.where(col("id") >= 10L && col("segment") === "Z").count() == 4)
  }

  test("invalid arguments fail fast") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(people, Seq("country"), 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.suppressBelowK(people, Seq("nope"), 3)
    }
  }
}
