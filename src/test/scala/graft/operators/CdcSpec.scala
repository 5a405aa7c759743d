package graft.operators

import graft.SparkSuite

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def ch(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("k", "seq", "op", "name", "score")

  test("changelog reduces to final state: last op wins per key") {
    val log = ch(
      (1L, 1L, "I", "a", 1.0), (1L, 2L, "U", "a2", 1.5),   // update survives
      (2L, 1L, "I", "b", 2.0),                              // plain insert
      (3L, 1L, "I", "c", 3.0), (3L, 2L, "D", null, 0.0),    // deleted
      (4L, 1L, "I", "d", 4.0), (4L, 2L, "D", null, 0.0),
      (4L, 3L, "I", "d2", 4.5))                             // delete then re-insert
    val got = Cdc.applyChangelog(log, "k", "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a2", 1.5), (2L, "b", 2.0), (4L, "d2", 4.5)))
  }

  test("a key whose only event is a delete never appears") {
    val got = Cdc.applyChangelog(ch((9L, 5L, "D", null, 0.0)), "k", "seq", "op")
    assert(got.count() == 0)
  }

  test("CDC final state == SCD2 current slice under the same update stream (seeded)") {
    // two independent implementations of "latest version per key" — the
    // aggregate fold (Cdc) and the dimension-history fold (Scd2) — must
    // agree on every randomized insert/update sequence
    val rnd = new scala.util.Random(7)
    val keys = (1L to 15L).toSeq
    val epochs = (1 to 5).map(i => (i.toLong, f"2024-$i%02d-01 00:00:00"))
    var hist = Scd2.emptyHistory(
      Seq((0L, "x", 0.0)).toDF("k", "tier", "score"), "k")
    val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String, Double)]
    epochs.foreach { case (seq, stamp) =>
      val batch = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, s"t${rnd.nextInt(3)}", rnd.nextInt(5).toDouble))
      if (batch.nonEmpty) {
        hist = Scd2.applyBatch(hist, batch.toDF("k", "tier", "score"), "k", stamp)
        batch.foreach { case (k, t, s) => log += ((k, seq, "I", t, s)) }
      }
    }
    val cdc = Cdc.applyChangelog(
        log.toSeq.toDF("k", "seq", "op", "tier", "score"), "k", "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    val scd2 = Scd2.currentOf(hist)
      .select($"k", $"tier", $"score")
      .as[(Long, String, Double)].collect().toSet
    assert(cdc == scd2, "the two latest-version folds diverged")
  }

  test("plan: one partial-agg shuffle, no window sort over the changelog") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Cdc.applyChangelog(
        ch((1L, 1L, "I", "a", 1.0), (1L, 2L, "U", "b", 2.0)), "k", "seq", "op")
      val plan = out.queryExecution.executedPlan
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }
      assert(shuffles.size == 1, s"expected the single key shuffle:\n$plan")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, s"max_by fold must not plan a window sort:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
