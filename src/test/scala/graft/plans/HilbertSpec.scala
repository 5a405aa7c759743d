package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Layout

class HilbertSpec extends SparkSuite {
  import spark.implicits._

  test("2-dim curve: bijective on the grid, consecutive cells are neighbors") {
    val bits = 3
    val side = 1 << bits
    val cells = for (x <- 0 until side; y <- 0 until side)
      yield (x.toLong, y.toLong) -> HilbertOps.index(bits, Array(x.toLong, y.toLong))
    val hs = cells.map(_._2)
    assert(hs.toSet.size == side * side, "curve must visit every cell once")
    assert(hs.min == 0L && hs.max == side * side - 1L)
    // the defining property the z-curve lacks: step i -> i+1 moves to a
    // GRID-ADJACENT cell (Manhattan distance exactly 1), every time
    val byH = cells.map { case (xy, h) => h -> xy }.toMap
    (0L until side * side - 1).foreach { h =>
      val (x0, y0) = byH(h); val (x1, y1) = byH(h + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at h=$h: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("3-dim curve: bijective and step-adjacent") {
    val bits = 2
    val side = 1 << bits
    val cells = for (x <- 0 until side; y <- 0 until side; z <- 0 until side)
      yield (x, y, z) -> HilbertOps.index(bits, Array(x.toLong, y.toLong, z.toLong))
    assert(cells.map(_._2).toSet.size == side * side * side)
    val byH = cells.map { case (c, h) => h -> c }.toMap
    (0L until side * side * side - 1).foreach { h =>
      val (x0, y0, z0) = byH(h); val (x1, y1, z1) = byH(h + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) + math.abs(z1 - z0) == 1,
        s"jump at h=$h")
    }
  }

  test("expression surface: codegen'd column equals the Scala fold; guards fire") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L)).toDF("x", "y")
      .withColumn("h", HilbertExpressions.hilbert(3, array(col("x"), col("y"))))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((x, y), h) =>
      assert(h == HilbertOps.index(3, Array(x, y)))
    }
    intercept[IllegalArgumentException] { HilbertOps.index(3, Array(1L)) }
    intercept[IllegalArgumentException] { HilbertOps.index(40, Array(1L, 2L)) }
  }

  test("morton expression: interleave positions match the reference fold, 2 and 3 dims") {
    // reference: bit i of dim d -> position i*k + d
    def ref(bits: Int, coords: Seq[Long]): Long = {
      val k = coords.size
      (0 until bits).foldLeft(0L) { (acc, i) =>
        coords.zipWithIndex.foldLeft(acc) { case (a, (x, d)) =>
          a | (((x >>> i) & 1L) << (i * k + d))
        }
      }
    }
    val samples2 = Seq(Seq(0L, 0L), Seq(5L, 3L), Seq(65535L, 1L), Seq(40000L, 7L))
    samples2.foreach { c =>
      assert(MortonOps.index(16, c.toArray) == ref(16, c), s"2-dim $c")
    }
    val samples3 = Seq(Seq(1L, 2L, 3L), Seq(7L, 0L, 65535L))
    samples3.foreach { c =>
      assert(MortonOps.index(16, c.toArray) == ref(16, c), s"3-dim $c")
    }
    // column surface
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(HilbertExpressions.morton(16, array(col("x"), col("y"))))
      .head.getLong(0)
    assert(got == ref(16, Seq(5L, 3L)))
  }

  test("layout: Hilbert file boxes prune at least as well as the z-curve on both dims") {
    import java.nio.file.Files
    val src = (0 until 8192).map { i =>
      (i.toLong, (i % 64).toLong, (i * 7919 % 64).toLong)
    }.toDF("id", "x", "y")
    val hDir = Files.createTempDirectory("graft_hil").toString
    val zDir = Files.createTempDirectory("graft_zor").toString
    Layout.writeHilbert(src, hDir, Seq("x", "y"), numFiles = 16)
    Layout.writeZOrderedN(src, zDir, Seq("x", "y"), numFiles = 16)
    def touching(dir: String, c: String): Int =
      Layout.fileRanges(spark, dir, c).count { case (mn, mx) => mx >= 0L && mn <= 7L }
    val hTotal = Layout.fileRanges(spark, hDir, "x").size
    Seq("x", "y").foreach { c =>
      assert(touching(hDir, c) < hTotal, s"Hilbert: no file skipped on $c")
    }
    // aggregate over both dims: the Hilbert layout must not lose to Morton
    val hSum = touching(hDir, "x") + touching(hDir, "y")
    val zSum = touching(zDir, "x") + touching(zDir, "y")
    assert(hSum <= zSum, s"Hilbert pruned worse than z-order: $hSum vs $zSum")
    assert(spark.read.parquet(hDir).count() == 8192L)
  }
}
