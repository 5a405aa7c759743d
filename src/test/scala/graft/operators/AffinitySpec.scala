package graft.operators

import graft.SparkSuite

class AffinitySpec extends SparkSuite {
  import spark.implicits._

  test("coPurchaseLift: hand-computed supports and lift; dup items collapse") {
    // baskets: {a,b} x3, {a,c}, {b,c}, {a} — item 'a' duplicated in b1
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"),
      (5L, "b"), (5L, "c"),
      (6L, "a")
    ).toDF("b", "i")
    val got = Affinity.coPurchaseLift(rows, "b", "i", minSupport = 1L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // N=6; n_a=5, n_b=4, n_c=2
    // (a,b): 3 -> lift 3*6/20 = 0.9; (a,c): 1 -> 6/10 = 0.6; (b,c): 1 -> 6/8 = 0.75
    assert(got == Map(
      ("a", "b") -> ((3L, 5L, 4L, 0.9)),
      ("a", "c") -> ((1L, 5L, 2L, 0.6)),
      ("b", "c") -> ((1L, 4L, 2L, 0.75))), s"got $got")
  }

  test("coPurchaseLift: support band prunes, oversized basket dropped whole") {
    val rows = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c")) ++
      (0 until 50).map(j => (99L, s"x$j"))).toDF("b", "i")
    val banded = Affinity.coPurchaseLift(rows, "b", "i",
        minSupport = 2L, k = 10, maxBasketSize = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(banded.map(r => (r._1, r._2)).toSeq == Seq(("a", "b")),
      s"only the support-2 pair survives; the 50-item basket sheds: ${banded.toSeq}")
    // N counts only kept baskets (3), so lift = 2*3/(3*2) = 1.0
    assert(banded.head._6 == 1.0, s"got ${banded.toSeq}")
  }

  test("coPurchaseLift plan: top-k is TakeOrderedAndProject, never a global sort") {
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("b", "i")
    val plan = Affinity.coPurchaseLift(rows, "b", "i", minSupport = 1L, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("coPurchaseLift: argument guards") {
    val rows = Seq((1L, "a")).toDF("b", "i")
    intercept[IllegalArgumentException] {
      Affinity.coPurchaseLift(rows, "b", "i", minSupport = 0L)
    }
    intercept[IllegalArgumentException] {
      Affinity.coPurchaseLift(rows, "b", "i", k = 0)
    }
  }
}
