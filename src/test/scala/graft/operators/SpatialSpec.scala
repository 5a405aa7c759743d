package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

class SpatialSpec extends SparkSuite {
  import spark.implicits._

  test("nearbyPairs: hand-computed pairs, exact integer dist2") {
    // (0,0)-(3,4) dist2 25 (= r2, inclusive); (0,0)-(30,0) out of range;
    // (3,4)-(30,0) dist2 745 out
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 30L, 0L))
      .toDF("id", "x", "y")
    val got = Spatial.nearbyPairs(pts, "id", "x", "y", radius = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 25L)), s"got $got")
  }

  test("nearbyPairs: cross-cell neighbors found (pair straddles a cell border)") {
    // radius 10 -> cells of width 10; (9,9) and (11,11) sit in different
    // cells but dist2 = 8 <= 100
    val pts = Seq((1L, 9L, 9L), (2L, 11L, 11L)).toDF("id", "x", "y")
    val got = Spatial.nearbyPairs(pts, "id", "x", "y", radius = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L)), s"got $got")
  }

  test("nearbyPairs: equals the brute-force join on a scattered point set") {
    val pts = (0L until 300L).map(i =>
      (i, (i * 7919) % 500, (i * 104729) % 500)).toDF("id", "x", "y")
    val got = Spatial.nearbyPairs(pts, "id", "x", "y", radius = 20L)
      .as[(Long, Long, Long)].collect().toSet
    val brute = pts.as("a").crossJoin(pts.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("d2"))
      .where(col("d2") <= 400L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"diff: ${got.diff(brute)} / ${brute.diff(got)}")
    assert(got.nonEmpty, "fixture must produce pairs")
  }

  test("nearbyPairs: a degenerate pileup cell is dropped whole, others survive") {
    // 50 points at the origin (pileup), 2 close points far away
    val pileup = (0L until 50L).map(i => (i, 1L, 1L))
    val clean = Seq((100L, 900L, 900L), (101L, 902L, 901L))
    val pts = (pileup ++ clean).toDF("id", "x", "y")
    val got = Spatial.nearbyPairs(pts, "id", "x", "y", radius = 10L,
        maxCellSize = 20).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 101L, 5L)),
      s"pileup pairs must be shed, clean pair kept: $got")
  }

  test("nearbyPairs: argument guards") {
    val pts = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Spatial.nearbyPairs(pts, "id", "x", "y", radius = 0L)
    }
    intercept[IllegalArgumentException] {
      Spatial.nearbyPairs(pts, "id", "x", "y", radius = 5L, maxCellSize = 1)
    }
  }
}
