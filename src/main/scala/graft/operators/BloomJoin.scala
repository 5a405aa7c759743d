package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter SEMI-JOIN REDUCTION — the regime between "broadcast the
  * small side as a hash table" and "shuffle both sides": when the filter
  * side has too many keys to broadcast as rows but its BLOOM FILTER fits
  * (m bits summarize any number of keys at a chosen false-positive rate),
  * probe the large side map-side with the bitset and let only candidates
  * reach the exact join. Catalyst's own InjectRuntimeFilter plays this
  * trick inside eligible shuffle joins; this operator is the explicit,
  * always-available form — usable in front of ANY downstream consumer
  * (a MERGE, an aggregation, a sink), not only the joins the rule
  * happens to match.
  *
  * Correctness contract: a Bloom filter has NO false negatives, and the
  * exact semi-join still runs after the probe — so the result equals the
  * plain semi-join bit-for-bit; the bloom stage only shrinks what the
  * exact join must shuffle. False positives cost only wasted candidate
  * rows (rate ≈ (1 − e^(−kn/m))^k; m = 2²⁰ bits / k = 5 holds ~10⁵ keys
  * under 1%).
  *
  * Scale shape: the bitset aggregates DISTRIBUTED (explode positions →
  * partial-agg `bit_or` per 64-bit word) and only the finished words —
  * ≤ numBits/64 longs, bounded BY CONSTRUCTION regardless of key count —
  * are collected and re-shipped to the executors; the probe is then a
  * map-only codegen'd predicate (xxhash64 + shift/mask), zero extra
  * shuffle on the large side before the filter. Transport matches size:
  * small bitsets ride the plan as a literal, large ones go out once per
  * executor as a real broadcast variable behind a native expression
  * ([[graft.plans.BroadcastBitTest]]) — a 32 MB filter never serializes
  * per-task.
  */
object BloomJoin {

  /** Distributed build: the filter's set words as an Array[Long] of
    * length numBits/64 (numBits must be a multiple of 64).
    */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numBits <= (1 << 28), s"numBits above 2^28 (32 MB) — broadcast " +
      s"cost outgrows the shuffle it saves; got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
    val nWords = numBits / 64
    val positions = (0 until numHashes).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(numBits.toLong)))
    val words = keys
      .select(explode(array(positions: _*)).as("pos"))
      .selectExpr("CAST(pos DIV 64 AS INT) AS word",
        "SHIFTLEFT(1L, CAST(pos % 64 AS INT)) AS bit")
      .groupBy(col("word")).agg(bit_or(col("bit")).as("mask"))
      .collect() // bounded: <= numBits/64 rows by construction
    val bits = new Array[Long](nWords)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Membership probe as a pure codegen'd predicate over a bitset
    * LITERAL: true iff every hash position's bit is set. Literal-only
    * regime — the array rides the plan and is serialized with every
    * task, so this variant caps at 2²² bits (512 KB); above that use
    * [[probeBroadcast]], which ships the bitset once per executor as a
    * real Spark broadcast variable.
    */
  def probe(bits: Array[Long], numBits: Int, numHashes: Int)
      (key: Column): Column = {
    require(numBits <= (1 << 22),
      s"literal probe caps at 2^22 bits (512 KB plan payload); " +
        s"got $numBits — use probeBroadcast for large bitsets")
    val arr = typedLit(bits.toSeq)
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      val word = element_at(arr, (pos / 64).cast("int") + 1)
      val bit = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(bit) =!= 0L
    }.reduce(_ && _)
  }

  /** Membership probe over a REAL broadcast variable
    * ([[graft.plans.BloomExpressions.bitTest]] — a native codegen'd
    * expression closing over the broadcast handle): the bitset ships to
    * each executor once, never with the plan. The variant for the upper
    * end of the permitted sizes (2²⁸ bits = 32 MB holds ~2·10⁷ keys at
    * 1% fp), where a literal would bloat every serialized task.
    */
  def probeBroadcast(spark: org.apache.spark.sql.SparkSession,
      bits: Array[Long], numBits: Int, numHashes: Int)
      (key: Column): Column = {
    val bc = spark.sparkContext.broadcast(bits)
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      graft.plans.BloomExpressions.bitTest(pos, bc)
    }.reduce(_ && _)
  }

  /** `large SEMI JOIN small` with the bloom reduction in front: exact
    * result (bloom admits every true match; the final semi-join removes
    * the false positives). The probe picks its transport by size:
    * literal for small bitsets (plan-local, zero setup), broadcast
    * variable above 2²² bits.
    */
  def bloomSemiJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bits = buildBits(small.select(col(smallKey)).distinct(), smallKey,
      numBits, numHashes)
    val pred =
      if (numBits <= (1 << 22)) probe(bits, numBits, numHashes)(col(largeKey))
      else probeBroadcast(large.sparkSession, bits, numBits, numHashes)(col(largeKey))
    large
      .where(pred)
      .join(small.select(col(smallKey).as(largeKey)).distinct(),
        Seq(largeKey), "left_semi")
  }
}
