package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite

class StatefulSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("flatMapGroupsWithState closes sessions on gap") {
    val events = Seq(
      Stateful.Event(1L, ts(0), "a", 1.0),
      Stateful.Event(1L, ts(10), "b", 2.0),   // same session (gap 30m)
      Stateful.Event(1L, ts(60), "c", 4.0),   // new session
      Stateful.Event(2L, ts(5), "x", 8.0)
    ).toDS()
    val out = Stateful.userSessionsBatch(spark, events, gapMillis = 30 * 60000L)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(out.length == 3)
    val first = out(0)
    assert(first.user_id == 1L && first.n_events == 2 && first.sum_value == 3.0)
    assert(first.session_start == ts(0) && first.session_end == ts(10))
    assert(out(1).n_events == 1 && out(1).sum_value == 4.0)
    assert(out(2).user_id == 2L && out(2).n_events == 1)
  }

  test("out-of-order events within a batch are sorted before sessionization") {
    val events = Seq(
      Stateful.Event(1L, ts(10), "b", 2.0),
      Stateful.Event(1L, ts(0), "a", 1.0)
    ).toDS()
    val out = Stateful.userSessionsBatch(spark, events, gapMillis = 30 * 60000L).collect()
    assert(out.length == 1 && out.head.n_events == 2)
  }

  test("sessionization runs under a real streaming plan") {
    val dir = java.nio.file.Files.createTempDirectory("stateful-in").toString
    Seq(
      Stateful.Event(1L, ts(0), "a", 1.0),
      Stateful.Event(1L, ts(90), "b", 2.0)
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[Stateful.Event]
    val q = Stateful.userSessions(spark, stream, gapMillis = 30 * 60000L)
      .writeStream.outputMode("append").format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      // first session closed by the 90-minute-later event; the open one
      // stays in state (no timeout configured)
      val rows = spark.table("sessions_out").collect()
      assert(rows.length == 1)
    } finally q.stop()
  }
}
