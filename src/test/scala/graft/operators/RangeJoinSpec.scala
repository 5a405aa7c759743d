package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("point-in-interval with keys: inclusive start, exclusive end") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:30:00")),  // inside iv A
      (2L, 10L, ts("2024-01-01 01:00:00")),  // == iv A end -> excluded
      (3L, 10L, ts("2024-01-01 00:00:00")),  // == iv A start -> included
      (4L, 20L, ts("2024-01-01 00:30:00")),  // right key, iv B
      (5L, 99L, ts("2024-01-01 00:30:00"))   // unknown key
    ).toDF("pid", "k", "pt")
    val ivs = Seq(
      ("A", 10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("B", 20L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      ("C", 10L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"))
    ).toDF("iv", "ik", "s", "e")
    val out = RangeJoin.pointInInterval(points, ivs,
      Seq("k"), Seq("ik"), "pt", "s", "e", bucketWidthMicros = 30L * 60 * 1000000)
      .select($"pid", $"iv").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "A"), (3L, "A"), (4L, "B")))
  }

  test("interval spanning many buckets still matches each point once") {
    val points = Seq((1L, 1L, ts("2024-01-05 12:00:00"))).toDF("pid", "k", "pt")
    val ivs = Seq(("wide", 1L, ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")))
      .toDF("iv", "ik", "s", "e")
    val out = RangeJoin.pointInInterval(points, ivs,
      Seq("k"), Seq("ik"), "pt", "s", "e", bucketWidthMicros = 3600L * 1000000)
    assert(out.count() == 1, "no duplicate matches from multi-bucket explode")
  }
}
