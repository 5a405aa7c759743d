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

  test("NULL fields of the latest right row are preserved, not backfilled") {
    // the 10:00 quote for key 1 has a NULL venue; a 09:30 trade joined
    // as-of 10:30 must see (price=101.0, venue=NULL) — one coherent image
    // of the LATEST row, never venue from the older 09:00 row
    val quotesWithVenue = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(100.0), Some("NYSE")),
      (1L, ts("2024-01-01 10:00:00"), Some(101.0), None)
    ).toDF("q_key", "q_ts", "price", "venue")
    val lateTrade = Seq((1L, 1L, ts("2024-01-01 10:30:00")))
      .toDF("trade_id", "t_key", "t_ts")
    val out = AsOfJoin.asOf(lateTrade, quotesWithVenue,
      leftKeys = Seq("t_key"), rightKeys = Seq("q_key"),
      leftTime = "t_ts", rightTime = "q_ts",
      rightCols = Map("price" -> "last_price", "venue" -> "last_venue"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(r.fieldIndex("last_price")) == 101.0)
    assert(r.isNullAt(r.fieldIndex("last_venue")),
      "venue must be the latest row's NULL, not the older row's NYSE")
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
