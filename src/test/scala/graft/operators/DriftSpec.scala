package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Distribution-drift monitors: exact KS statistic and per-bin PSI. */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("ksStatistic: identical samples -> 0, disjoint samples -> 1") {
    val a = (1 to 50).map(_.toDouble).toDF("v")
    val same = Drift.ksStatistic(a, a, "v").head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    val b = (101 to 150).map(_.toDouble).toDF("v")
    val far = Drift.ksStatistic(a, b, "v").head()
    assert(far.getDouble(3) == 1.0, s"disjoint supports must reach 1: $far")
    assert(far.getLong(2) == 50L * 50L)
  }

  test("ksStatistic matches the brute-force sup over a known case") {
    // a = {1,2,3,4}, b = {3,4,5,6}: sup|F_a - F_b| at v=2: |2/4 - 0/4| = 0.5
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").head()
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getLong(2) == 8L, s"sup |cumA*nb - cumB*na| = |2*4-0*4|: $r")
    assert(r.getDouble(3) == 0.5)
  }

  test("ksStatistic: duplicate values collapse into one ECDF step") {
    // ties must not double-count: a has 3x the value 2
    val a = Seq(1.0, 2.0, 2.0, 2.0).toDF("v")
    val b = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").head()
    // at v=2: F_a = 4/4, F_b = 2/4 -> gap 8; at v=1: |1*4-1*4| = 0
    assert(r.getLong(2) == 8L && r.getDouble(3) == 0.5, s"got $r")
  }

  test("psiBins: identical distributions -> zero terms; shift localizes") {
    val a = (Seq.fill(60)(10.0) ++ Seq.fill(40)(35.0)).toDF("v")
    val sameTerms = Drift.psiBins(a, a, "v", binWidth = 25.0)
      .select($"psi_term").as[Double].collect()
    assert(sameTerms.length == 2 && sameTerms.forall(_ == 0.0))
    // b shifts mass from bin 0 to bin 1: both terms nonzero, term sign
    // follows the direction of the shift
    val b = (Seq.fill(40)(10.0) ++ Seq.fill(60)(35.0)).toDF("v")
    val terms = Drift.psiBins(a, b, "v", binWidth = 25.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(terms(0L) > 0 && terms(1L) > 0,
      s"PSI terms are (p-q)ln(p/q) >= 0 for two-sided shifts: $terms")
    // hand value: (0.6-0.4)*ln(0.6/0.4) rounded to 6
    assert(math.abs(terms(0L) - 0.2 * math.log(1.5)) < 1e-6, s"got ${terms(0L)}")
  }

  test("wasserstein1: hand value on a staircase, zero on identical, symmetric") {
    // a = {0, 0, 4, 4}, b = {2, 2, 2, 2}: |F_a - F_b| is 1/2 on [0,2)
    // and 1/2 on [2,4) -> W1 = 2.0
    val a = Seq(0.0, 0.0, 4.0, 4.0).toDF("v")
    val b = Seq(2.0, 2.0, 2.0, 2.0).toDF("v")
    val r = Drift.wasserstein1(a, b, "v").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getDouble(2) == 2.0, s"got $r")
    assert(Drift.wasserstein1(b, a, "v").head().getDouble(2) == 2.0)
    assert(Drift.wasserstein1(a, a, "v").head().getDouble(2) == 0.0)
  }

  test("wasserstein1: pure location shift of a point mass = the shift distance") {
    val a = Seq.fill(7)(10.0).toDF("v")
    val b = Seq.fill(3)(13.5).toDF("v")
    // F_a jumps to 1 at 10, F_b at 13.5: gap 1 over [10, 13.5) -> 3.5
    assert(Drift.wasserstein1(a, b, "v").head().getDouble(2) == 3.5)
  }

  test("wasserstein1 survives a range-partition boundary (many distinct values)") {
    // 5000 distinct values forced through 32+ range partitions: the
    // cross-partition lead and offset stitching must reproduce the
    // closed form W1(U{0..n-1}, U{0..n-1}+c) = c
    val a = spark.range(5000).selectExpr("CAST(id AS DOUBLE) AS v")
    val b = spark.range(5000).selectExpr("CAST(id AS DOUBLE) + 0.25 AS v")
    assert(Drift.wasserstein1(a, b, "v").head().getDouble(2) == 0.25)
  }

  test("wasserstein1 plan pin: every Window partitions by __pid — no global window") {
    val a = spark.range(2000).selectExpr("CAST(id AS DOUBLE) AS v")
    val b = spark.range(2000).selectExpr("CAST(id AS DOUBLE) + 0.5 AS v")
    // capture Window nodes from the per-partition pass: analyze the
    // staircase stage lazily via the plan the operator builds (the
    // operator materializes internally, so probe the plan by running
    // and inspecting the recorded physical plans of the session)
    val tracker = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var globalWindows = 0
      @volatile var partitionedWindows = 0
      private def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: flatten(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(s.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        flatten(qe.executedPlan).foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            if (w.partitionSpec.isEmpty) globalWindows += 1
            else partitionedWindows += 1
          case _ =>
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(tracker)
    try {
      val r = Drift.wasserstein1(a, b, "v").head()
      assert(r.getDouble(2) == 0.5)
      // the listener is async: wait until the staircase pass (the
      // __pid-partitioned windows) has been observed, then judge
      val deadline = System.nanoTime() + 10_000_000_000L
      while (tracker.partitionedWindows == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(tracker.partitionedWindows > 0,
        "listener never saw the __pid-partitioned staircase windows")
      assert(tracker.globalWindows == 0,
        s"wasserstein1 ran ${tracker.globalWindows} single-partition global Window(s)")
    } finally spark.listenerManager.unregister(tracker)
  }

  test("ksStatistic guards: empty side and oversize contract") {
    val a = Seq(1.0).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Drift.ksStatistic(a, spark.emptyDataFrame.selectExpr("CAST(1.0 AS DOUBLE) AS v").where(lit(false)), "v")
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("wasserstein1 guards: empty input raises the contract error, not an NPE") {
    val a = Seq(1.0).toDF("v")
    val none = a.where(lit(false))
    val e = intercept[IllegalArgumentException] {
      Drift.wasserstein1(a, none, "v")
    }
    assert(e.getMessage.contains("non-empty"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Drift.wasserstein1(none, none, "v")
    }
    assert(e2.getMessage.contains("non-empty"), e2.getMessage)
  }
}
