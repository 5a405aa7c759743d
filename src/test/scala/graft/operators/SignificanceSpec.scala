package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Deterministic resampling tests: degenerate hand cases, structural
  * bounds, and partitioning independence of the LCG draw streams. */
class SignificanceSpec extends SparkSuite {
  import spark.implicits._

  test("pairedBootstrap: all-zero deltas collapse to a zero CI, p = 1") {
    val items = (1L to 40L).map(i => (i, 0L)).toDF("id", "d")
    val r = Significance.pairedBootstrap(items, "id", "d", nBoot = 50).head()
    assert(r.getLong(0) == 40L && r.getInt(1) == 50)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 1.0, s"every replicate mean is 0 <= 0: $r")
  }

  test("pairedBootstrap: constant +1 deltas give a degenerate CI at 1, p = 0") {
    val items = (1L to 25L).map(i => (i, 1L)).toDF("id", "d")
    val r = Significance.pairedBootstrap(items, "id", "d", nBoot = 50).head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 0.0, s"$r")
  }

  test("pairedBootstrap: CI brackets a strong effect; partitioning-independent") {
    val items = ((1L to 90L).map(i => (i, 1L)) ++ (91L to 100L).map(i => (i, -1L)))
      .toDF("id", "d")
    val a = Significance.pairedBootstrap(items, "id", "d", nBoot = 200).head()
    assert(a.getDouble(2) == 0.8, s"mean: $a")
    assert(a.getDouble(3) <= a.getDouble(4), s"ci order: $a")
    assert(a.getDouble(3) > 0.0, s"a 0.8 effect over 100 items clears 0: $a")
    assert(a.getDouble(5) == 0.0, s"$a")
    val b = Significance.pairedBootstrap(items.repartition(13), "id", "d",
      nBoot = 200).head()
    assert(a == b, "resamples must not depend on partitioning")
  }

  test("signFlipTest: zero observed sum is never significant (p = 1)") {
    val items = ((1L to 10L).map(i => (i, 1L)) ++ (11L to 20L).map(i => (i, -1L)))
      .toDF("id", "d")
    val r = Significance.signFlipTest(items, "id", "d", nPerm = 50).head()
    assert(r.getLong(2) == 0L)
    assert(r.getDouble(3) == 1.0, s"|s| >= 0 always: $r")
  }

  test("signFlipTest: a one-sided effect is significant; deterministic") {
    val items = (1L to 60L).map(i => (i, 1L)).toDF("id", "d")
    val a = Significance.signFlipTest(items, "id", "d", nPerm = 200).head()
    assert(a.getLong(2) == 60L)
    // null stats are |sum of 60 random signs|: reaching 60 needs all
    // flips equal — the add-one p stays at the floor unless the LCG
    // degenerates
    assert(a.getDouble(3) ==
      BigDecimal(1.0 / 201.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, s"$a")
    val b = Significance.signFlipTest(items.repartition(7), "id", "d",
      nPerm = 200).head()
    assert(a == b)
  }

  test("empty eval set refuses loudly") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "d")
    val e1 = intercept[Exception] {
      Significance.pairedBootstrap(empty, "id", "d")
    }
    assert(e1.getMessage.contains("empty eval set"))
    val e2 = intercept[Exception] {
      Significance.signFlipTest(empty, "id", "d")
    }
    assert(e2.getMessage.contains("empty eval set"))
  }
}
