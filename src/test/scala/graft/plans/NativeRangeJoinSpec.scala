package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkSuite
import graft.operators.{RangeJoin, Tables}

/** The native broadcast range join (logical node + strategy + exec +
  * rewrite rule via SparkSessionExtensions) against the composed
  * bucketized implementation and Spark's own nested-loop fallback.
  */
class NativeRangeJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private def events = Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("ts"))

  private def intervals = Tables.load(spark, sf, "orders").select(
    col("o_orderkey"), col("o_custkey"),
    (lit("2024-01-01 00:00:00").cast("timestamp") +
      expr("make_interval(0, 0, 0, 0, CAST(o_orderkey % 96 AS INT), 0, 0)")).as("iv_start"))
    .withColumn("iv_end", col("iv_start") + expr("INTERVAL 2 HOURS"))

  test("native == composed bucketized range join on testdata") {
    val native = NativeRangeJoin.pointInInterval(events, intervals,
      Seq("user_id"), Seq("o_custkey"), "ts", "iv_start", "iv_end")
      .select(col("event_id"), col("o_orderkey"))
    val composed = RangeJoin.pointInInterval(events, intervals,
      Seq("user_id"), Seq("o_custkey"), "ts", "iv_start", "iv_end",
      bucketWidthMicros = 2L * 3600 * 1000000)
      .select(col("event_id"), col("o_orderkey"))
    assert(native.count() === composed.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("plan uses BroadcastRangeJoinExec, point side has no Exchange") {
    val native = NativeRangeJoin.pointInInterval(events, intervals,
      Seq("user_id"), Seq("o_custkey"), "ts", "iv_start", "iv_end")
    native.collect()
    val plan = native.queryExecution.executedPlan
    val execs = collect(plan) { case e: BroadcastRangeJoinExec => e }
    assert(execs.nonEmpty, s"expected BroadcastRangeJoinExec in:\n$plan")
    // The probe side streams through untouched — no shuffle anywhere.
    assert(!plan.toString.contains("Exchange"), s"unexpected Exchange in:\n$plan")
  }

  test("optimizer rule rewrites a declarative inner join with range predicate") {
    val e = events
    val iv = intervals
    val plain = e.join(iv,
      e("user_id") === iv("o_custkey") &&
        e("ts") >= iv("iv_start") && e("ts") < iv("iv_end"))
    val execs = collect(plain.queryExecution.executedPlan) { case e: BroadcastRangeJoinExec => e }
    assert(execs.nonEmpty,
      s"rewrite rule did not fire:\n${plain.queryExecution.executedPlan}")
    assert(execs.head.leftKeys.length === 1)
  }

  test("rule disabled -> Spark fallback plan, same results") {
    val iv = intervals
    val joined = (e: org.apache.spark.sql.DataFrame) => e.join(iv,
      e("user_id") === iv("o_custkey") &&
        e("ts") >= iv("iv_start") && e("ts") < iv("iv_end"))
      .select(col("event_id"), col("o_orderkey"))
    val withRule = joined(events).collect().toSet
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val fallback = joined(events)
      val execs = collect(fallback.queryExecution.executedPlan) { case e: BroadcastRangeJoinExec => e }
      assert(execs.isEmpty, "rule fired while disabled")
      assert(fallback.collect().toSet === withRule)
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  test("rule stays out: non-range predicates and over-threshold build sides") {
    val e = events
    val iv = intervals
    def hasNative(df: org.apache.spark.sql.DataFrame) =
      collect(df.queryExecution.executedPlan) { case x: BroadcastRangeJoinExec => x }.nonEmpty

    // No upper bound -> not a range join; Spark plans it its own way.
    val lowerOnly = e.join(iv,
      e("user_id") === iv("o_custkey") && e("ts") >= iv("iv_start"))
    assert(!hasNative(lowerOnly), "fired without an upper bound")

    // Build side above the broadcast threshold -> stays declarative.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val tooBig = e.join(iv,
        e("user_id") === iv("o_custkey") &&
          e("ts") >= iv("iv_start") && e("ts") < iv("iv_end"))
      assert(!hasNative(tooBig), "fired above the broadcast threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // Intervals on the LEFT child: the mirrored pattern fires with a
    // Project restoring the join's original column order.
    val swapped = iv.join(e,
      iv("o_custkey") === e("user_id") &&
        iv("iv_start") <= e("ts") && iv("iv_end") > e("ts"))
    assert(hasNative(swapped), "mirrored orientation did not fire")
    assert(swapped.columns.toSeq === (iv.columns.toSeq ++ e.columns.toSeq),
      "swapped rewrite changed column order")
    val expected = e.join(iv,
      e("user_id") === iv("o_custkey") &&
        e("ts") >= iv("iv_start") && e("ts") < iv("iv_end")).count()
    assert(swapped.count() === expected)
  }

  test("overlapping intervals, no equi keys, null hygiene") {
    import spark.implicits._
    val pts = Seq(
      (1, Timestamp.valueOf("2024-01-01 00:30:00")),
      (2, Timestamp.valueOf("2024-01-01 02:30:00")),
      (3, null.asInstanceOf[Timestamp]))
      .toDF("pid", "t")
    // Overlapping + nested + null-bound intervals.
    val ivs = Seq(
      (10, Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-01-01 04:00:00")),
      (11, Timestamp.valueOf("2024-01-01 00:15:00"), Timestamp.valueOf("2024-01-01 01:00:00")),
      (12, Timestamp.valueOf("2024-01-01 02:00:00"), Timestamp.valueOf("2024-01-01 03:00:00")),
      (13, null.asInstanceOf[Timestamp], Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("iid", "s", "e")
    val native = NativeRangeJoin.pointInInterval(pts, ivs, Nil, Nil, "t", "s", "e")
      .select(col("pid"), col("iid"))
    val expected = pts.join(ivs, pts("t") >= ivs("s") && pts("t") < ivs("e"))
      .select(col("pid"), col("iid"))
    assert(native.collect().toSet === expected.collect().toSet)
    assert(native.count() === 4) // pid1 -> 10,11; pid2 -> 10,12
  }
}
