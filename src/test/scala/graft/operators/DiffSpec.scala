package graft.operators

import graft.SparkSuite

class DiffSpec extends SparkSuite {
  import spark.implicits._

  private def before = Seq(
    (1L, Option("a"), 1.0), (2L, Option("b"), 2.0),
    (3L, Option("c"), 3.0), (4L, Option.empty[String], 4.0)
  ).toDF("k", "name", "score")

  private def after = Seq(
    (1L, Option("a"), 1.0),              // unchanged
    (2L, Option("B"), 2.0),              // changed (value)
    (4L, Option("now-set"), 4.0),        // changed (null -> value, null-safe)
    (5L, Option("new"), 5.0)             // added; key 3 removed
  ).toDF("k", "name", "score")

  test("per-key diff statuses, null-safe") {
    val got = Diff.tableDiff(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("summary counts every status") {
    val got = Diff.diffSummary(before, after, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("null == null is unchanged (null-safe equality)") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "name")
    val got = Diff.tableDiff(a, a, Seq("k")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged"))
  }

  test("schema drift between versions is rejected") {
    val e = intercept[IllegalArgumentException] {
      Diff.tableDiff(before, after.withColumnRenamed("score", "points"), Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"), e.getMessage)
  }

  test("plan: exactly one join, no second pass for the summary") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Diff.diffSummary(before, after, Seq("k"))
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.size == 1, s"one full-outer join expected:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
