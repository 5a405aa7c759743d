package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min sketch: one-sided error, collision-free exactness, counter
  * additivity, and the bounded-size build contract.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  // 1000 rows over 50 keys: key k appears k+1 times (skewed, known counts)
  private def skewed = spark.range(50).selectExpr("id AS key")
    .select(col("key"), explode(sequence(lit(0L), col("key"))).as("rep"))
    .select(col("key"))

  test("estimate is a one-sided upper bound: est >= exact for every key") {
    val sk = CountMin.build(skewed, "key", depth = 4, width = 16)
    val probes = spark.range(50).selectExpr("id AS key")
    val est = CountMin.estimate(sk, probes, "key", depth = 4, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 50L).foreach { k =>
      assert(est(k) >= k + 1, s"key $k: est ${est(k)} < exact ${k + 1}")
    }
    // width 16 for 50 keys forces collisions: some estimate must exceed truth
    assert((0L until 50L).exists(k => est(k) > k + 1),
      "16 counters for 50 keys cannot be collision-free")
  }

  test("wide sketch (no collisions possible per row) is exact; misses read 0") {
    val sk = CountMin.build(skewed, "key", depth = 4, width = 4096)
    val probes = spark.range(60).selectExpr("id AS key") // 50..59 never seen
    val est = CountMin.estimate(sk, probes, "key", depth = 4, width = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 50L).foreach { k =>
      assert(est(k) == k + 1, s"key $k: est ${est(k)} != exact ${k + 1}")
    }
    // absent keys: an untouched counter may still collide at width 4096
    // with 50 keys — but depth-4 min over independent rows reads 0 here
    (50L until 60L).foreach { k =>
      assert(est(k) == 0L, s"unseen key $k read ${est(k)}")
    }
  }

  test("counters are additive: union-then-reaggregate == build of the union") {
    val a = skewed.where(col("key") < 25)
    val b = skewed.where(col("key") >= 25)
    val merged = CountMin.merge(
      CountMin.build(a, "key", 3, 64), CountMin.build(b, "key", 3, 64))
    val direct = CountMin.build(skewed, "key", 3, 64)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged shard sketches must equal the one-pass sketch")
  }

  test("sketch size is bounded by depth*width regardless of input size") {
    val sk = CountMin.build(skewed, "key", depth = 4, width = 16)
    assert(sk.count() <= 4L * 16)
  }
}
