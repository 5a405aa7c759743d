package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 09:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:00"), 101.0),
    (1L, ts("2024-01-01 11:00:00"), 99.0),
    (2L, ts("2024-01-01 09:30:00"), 50.0)
  ).toDF("q_key", "q_ts", "price")

  private val trades = Seq(
    (1L, 1L, ts("2024-01-01 09:30:00")),  // after 09:00 quote -> 100.0
    (2L, 1L, ts("2024-01-01 10:00:00")),  // exactly at 10:00 quote -> 101.0
    (3L, 1L, ts("2024-01-01 08:00:00")),  // before any quote -> null
    (4L, 2L, ts("2024-01-01 12:00:00")),  // -> 50.0
    (5L, 3L, ts("2024-01-01 12:00:00"))   // no quotes for key 3 -> null
  ).toDF("trade_id", "t_key", "t_ts")

  test("as-of semantics: latest right row at-or-before left time, per key") {
    val out = AsOfJoin.asOf(trades, quotes,
      leftKeys = Seq("t_key"), rightKeys = Seq("q_key"),
      leftTime = "t_ts", rightTime = "q_ts",
      rightCols = Map("price" -> "last_price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L).contains(100.0), "09:30 trade sees the 09:00 quote")
    assert(out(2L).contains(101.0), "equality included: 10:00 trade sees the 10:00 quote")
    assert(out(3L).isEmpty, "trade before any quote gets null")
    assert(out(4L).contains(50.0))
    assert(out(5L).isEmpty, "unknown key gets null")
  }

  test("left row count is preserved (it is a left join)") {
    val out = AsOfJoin.asOf(trades, quotes,
      leftKeys = Seq("t_key"), rightKeys = Seq("q_key"),
      leftTime = "t_ts", rightTime = "q_ts",
      rightCols = Map("price" -> "last_price"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("trade_id", "t_key", "t_ts", "last_price"))
  }

  test("output-name collision is rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes,
        leftKeys = Seq("t_key"), rightKeys = Seq("q_key"),
        leftTime = "t_ts", rightTime = "q_ts",
        rightCols = Map("price" -> "trade_id"))
    }
  }
}
