package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bloom semi-join reduction: exactness (no false negatives survive, false
  * positives are verified away), real candidate reduction, and the bounded
  * build contract.
  */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private def large = spark.range(0, 10000).selectExpr("id AS k")
  private def small = spark.range(0, 10000).selectExpr("id AS k")
    .where(col("k") % 100 === 0) // 100 true keys, 1% selective

  test("bloomSemiJoin equals the plain semi-join bit-for-bit") {
    val viaBloom = BloomJoin.bloomSemiJoin(large, "k", small, "k",
      numBits = 1 << 12, numHashes = 4)
    val plain = large.join(small, Seq("k"), "left_semi")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() == 100)
  }

  test("even a saturated tiny filter stays exact (verify removes the FPs)") {
    // 64 bits for 100 keys: nearly every probe is a false positive
    val viaBloom = BloomJoin.bloomSemiJoin(large, "k", small, "k",
      numBits = 64, numHashes = 2)
    assert(viaBloom.count() == 100)
  }

  test("probe admits every true key (no false negatives) and prunes most others") {
    val bits = BloomJoin.buildBits(small, "k", numBits = 1 << 12, numHashes = 4)
    val candidates = large
      .where(BloomJoin.probe(bits, 1 << 12, 4)(col("k")))
      .select($"k").as[Long].collect().toSet
    val truth = (0L until 10000L by 100L).toSet
    assert(truth.subsetOf(candidates), "bloom dropped a true key")
    // 4096 bits / 4 hashes / 100 keys -> fpp ~ 0.03%; allow generous slack.
    // This is the point of the operator: ~99% of the large side never
    // reaches the exact join's shuffle.
    assert(candidates.size < 1000,
      s"expected strong candidate reduction, got ${candidates.size} of 10000")
  }

  test("build is bounded: bitset words == numBits/64, independent of keys") {
    val bits = BloomJoin.buildBits(small, "k", numBits = 1 << 10, numHashes = 3)
    assert(bits.length == (1 << 10) / 64)
    assert(bits.exists(_ != 0L), "some word must be set")
  }

  test("probeBroadcast equals the literal probe decision-for-decision") {
    val bits = BloomJoin.buildBits(small, "k", numBits = 1 << 12, numHashes = 4)
    val lit = large.where(BloomJoin.probe(bits, 1 << 12, 4)(col("k")))
      .select($"k").as[Long].collect().toSet
    val bc = large.where(
        BloomJoin.probeBroadcast(spark, bits, 1 << 12, 4)(col("k")))
      .select($"k").as[Long].collect().toSet
    assert(lit == bc, "broadcast transport changed probe decisions")
  }

  test("bloomSemiJoin stays exact on the broadcast-variable transport (> 2^22 bits)") {
    val viaBloom = BloomJoin.bloomSemiJoin(large, "k", small, "k",
      numBits = 1 << 23, numHashes = 5)
    val plain = large.join(small, Seq("k"), "left_semi")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() == 100)
  }

  test("the literal probe refuses plan-bloating bitsets") {
    val bits = new Array[Long]((1 << 23) / 64)
    intercept[IllegalArgumentException] {
      BloomJoin.probe(bits, 1 << 23, 4)(col("k"))
    }
  }

  test("plan shape: the bloom probe adds ZERO shuffle to the large side") {
    val bits = BloomJoin.buildBits(small, "k", numBits = 1 << 12, numHashes = 4)
    val probed = large.where(BloomJoin.probe(bits, 1 << 12, 4)(col("k")))
    val exchanges = probed.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty,
      s"probe must be map-only — candidates shrink BEFORE any exchange:\n" +
        probed.queryExecution.executedPlan)
  }
}
