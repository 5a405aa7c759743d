package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.plans.SketchAggregates.bottom_k

/** ScalaCheck properties for the custom plan tier, generator-sampled with
  * fixed seeds (same offline-cache pattern as MergePropertiesSpec):
  *  - native range join == the naive inequality join on random
  *    overlapping/degenerate/keyed intervals;
  *  - bottom_k is invariant to row order and partitioning (merge
  *    associativity/commutativity observed through results).
  */
class PlanPropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val Trials = 6

  // ---- native range join vs naive join --------------------------------

  private val pointGen: Gen[(Long, Long, Long)] = for {
    id <- Gen.chooseNum(0L, 500L)
    key <- Gen.chooseNum(0L, 5L)
    t <- Gen.chooseNum(0L, 100L)
  } yield (id, key, t)

  private val intervalGen: Gen[(Long, Long, Long, Long)] = for {
    id <- Gen.chooseNum(1000L, 1100L)
    key <- Gen.chooseNum(0L, 5L)
    s <- Gen.chooseNum(0L, 100L)
    w <- Gen.chooseNum(0L, 40L) // width 0 = degenerate empty interval
  } yield (id, key, s, s + w)

  private def points(seed: Long) =
    Gen.listOfN(120, pointGen).pureApply(Gen.Parameters.default, Seed(seed))
  private def intervals(seed: Long) =
    Gen.listOfN(40, intervalGen).pureApply(Gen.Parameters.default, Seed(seed))

  test("property: native range join == naive inequality join (keyed)") {
    for (i <- 0 until Trials) {
      val p = points(i).toDF("pid", "pkey", "t")
      val iv = intervals(i + 50).toDF("iid", "ikey", "s", "e")
      val native = NativeRangeJoin.pointInInterval(
        p, iv, Seq("pkey"), Seq("ikey"), "t", "s", "e")
        .select($"pid", $"iid")
      val naive = p.join(iv,
        p("pkey") === iv("ikey") && p("t") >= iv("s") && p("t") < iv("e"))
        .select($"pid", $"iid")
      assert(native.collect().toSet === naive.collect().toSet, s"trial $i")
      assert(native.count() === naive.count(), s"trial $i (duplicate matches)")
    }
  }

  test("property: native range join == naive inequality join (no keys)") {
    for (i <- 0 until Trials) {
      val p = points(i + 200).toDF("pid", "pkey", "t")
      val iv = intervals(i + 250).toDF("iid", "ikey", "s", "e")
      val native = NativeRangeJoin.pointInInterval(
        p, iv, Nil, Nil, "t", "s", "e").select($"pid", $"iid")
      val naive = p.join(iv, p("t") >= iv("s") && p("t") < iv("e"))
        .select($"pid", $"iid")
      assert(native.collect().toSet === naive.collect().toSet, s"trial $i")
      assert(native.count() === naive.count(), s"trial $i")
    }
  }

  // ---- bottom_k invariances -------------------------------------------

  private val docGen: Gen[(Long, String)] = for {
    g <- Gen.chooseNum(0L, 3L)
    v <- Gen.alphaStr.map(_.take(8))
  } yield (g, v)

  test("property: bottom_k invariant to row order and partitioning") {
    for (i <- 0 until Trials) {
      val rows = Gen.listOfN(200, docGen).pureApply(Gen.Parameters.default, Seed(i + 700L))
      def sketch(parts: Int, shuffled: List[(Long, String)]) =
        shuffled.toDF("g", "v").repartition(parts)
          .groupBy($"g").agg(bottom_k($"v", 4).as("s"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val a = sketch(1, rows)
      val b = sketch(9, rows.reverse)
      val c = sketch(3, scala.util.Random.javaRandomToRandom(
        new java.util.Random(i)).shuffle(rows))
      assert(a === b, s"trial $i order")
      assert(a === c, s"trial $i partitioning")
    }
  }
}
