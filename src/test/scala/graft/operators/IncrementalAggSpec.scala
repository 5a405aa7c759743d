package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def dec(s: String) = new java.math.BigDecimal(s)

  private def base = Seq(
    ("a", dec("10.00")), ("a", dec("20.00")),
    ("b", dec("5.00")),
    ("c", dec("7.50"))
  ).toDF("g", "v").select($"g", $"v".cast("decimal(18,2)").as("v"))

  private def ch(rows: (String, String, String, String, String)*) =
    rows.toDF("op", "group", "value", "old_group", "old_value")
      .select($"op", $"group", $"value".cast("decimal(18,2)").as("value"),
        $"old_group", $"old_value".cast("decimal(18,2)").as("old_value"))

  test("insert / delete / group-moving update fold to the recomputed view") {
    val state0 = IncrementalAgg.build(base, "g", "v")
    val changes = ch(
      ("I", "a", "30.00", null, null),          // new 'a' row
      ("D", null, null, "b", "5.00"),           // 'b' empties out
      ("U", "x", "8.50", "c", "7.50"))          // 'c' row moves to new group 'x'
    val got = IncrementalAgg.applyChanges(state0, changes, "g")
      .select($"g", $"n", $"total".cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(("a", 3L, "60.00"), ("x", 1L, "8.50")), s"got $got")
  }

  test("incremental maintenance equals a from-scratch build of the final base") {
    val state0 = IncrementalAgg.build(base, "g", "v")
    val changes = ch(
      ("I", "b", "1.00", null, null),
      ("U", "a", "25.00", "a", "20.00"))        // in-place value update
    val incremental = IncrementalAgg.applyChanges(state0, changes, "g")
    val finalBase = Seq(
      ("a", dec("10.00")), ("a", dec("25.00")),
      ("b", dec("5.00")), ("b", dec("1.00")),
      ("c", dec("7.50"))
    ).toDF("g", "v").select($"g", $"v".cast("decimal(18,2)").as("v"))
    val recomputed = IncrementalAgg.build(finalBase, "g", "v")
    assert(incremental.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(incremental).isEmpty,
      "delta-maintained state must equal the recompute exactly")
  }

  test("double value columns are rejected (non-associative sums would drift)") {
    val dbl = Seq(("a", 1.5)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.build(dbl, "g", "v")
    }
    assert(e.getMessage.contains("exact type"), e.getMessage)
  }

  test("plan: one refresh = one shuffle over state+deltas, base untouched") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // state arrives materialized (as a real MV would); the refresh plan
      // must contain exactly the one group-key exchange
      val state0 = IncrementalAgg.build(base, "g", "v").localCheckpoint()
      val changes = ch(("I", "a", "1.00", null, null))
      val plan = IncrementalAgg.applyChanges(state0, changes, "g")
        .queryExecution.executedPlan
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }
      assert(shuffles.size == 1, s"refresh must cost one exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
