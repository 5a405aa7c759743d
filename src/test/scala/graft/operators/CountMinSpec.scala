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

  test("plan shapes: build shuffles once (partial-agg), probe broadcasts the sketch") {
    val sk = CountMin.build(skewed, "key", depth = 4, width = 16)
    // string form: AQE's AdaptiveSparkPlan hides children from collect()
    val buildPlan = sk.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(buildPlan).size == 1,
      s"build must be ONE (d,bucket)-keyed shuffle:\n$buildPlan")
    assert(buildPlan.contains("partial_count"),
      s"map-side combine must run before the exchange:\n$buildPlan")
    val probes = spark.range(50).selectExpr("id AS key")
    val est = CountMin.estimate(sk, probes, "key", depth = 4, width = 16)
    val probePlan = est.queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastHashJoin") || probePlan.contains("BroadcastExchange"),
      s"the sketch side must broadcast:\n$probePlan")
  }

  test("streaming maintenance: foreachBatch-merged sketch equals the batch build") {
    // the q143 additivity contract driven through an actual stream: each
    // micro-batch's delta sketch merges into the store, history never
    // rescanned; the final store must equal a from-scratch build
    val in = java.nio.file.Files.createTempDirectory("cms-stream").toString
    val store = java.nio.file.Files.createTempDirectory("cms-store").toString + "/sk"
    spark.range(0, 400).selectExpr("id % 37 AS key")
      .coalesce(1).write.parquet(s"$in/f1")
    spark.range(400, 1000).selectExpr("id % 23 AS key")
      .coalesce(1).write.parquet(s"$in/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val q = stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
      val delta = CountMin.build(batch, "key", depth = 3, width = 16)
      val merged =
        if (new java.io.File(store).exists)
          CountMin.merge(delta.sparkSession.read.parquet(store), delta)
        else delta
      // bounded materialization (<= depth*width rows) so the overwrite
      // never reads what it is replacing
      val rows = merged.collect().toSeq
      val ss = delta.sparkSession
      ss.createDataFrame(ss.sparkContext.parallelize(rows, 1), merged.schema)
        .write.mode("overwrite").parquet(store)
      ()
    }.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("cms-ck").toString).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(store)
    val direct = CountMin.build(
      spark.range(0, 400).selectExpr("id % 37 AS key").unionByName(
        spark.range(400, 1000).selectExpr("id % 23 AS key")),
      "key", depth = 3, width = 16)
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty,
      "stream-maintained sketch must equal the one-pass batch build")
  }

  test("joinSizeEstimate: upper bound always; EXACT when width kills collisions") {
    val a = spark.range(0, 600).selectExpr("id % 37 AS k")
    val b = spark.range(0, 200).selectExpr("id % 23 AS k")
    val exact = a.join(b, "k").count()
    // collision-free regime: every surviving key pair is a real key ->
    // the dot product IS sum_k cntA(k)*cntB(k) = the true join size
    val wide = CountMin.joinSizeEstimate(a, "k", b, "k",
      depth = 2, width = 1 << 16, withExact = true).head()
    assert(wide.getLong(2) == exact && wide.getLong(3) == exact, s"got $wide")
    // tight width: collisions only ADD phantom mass - never undercount
    val tight = CountMin.joinSizeEstimate(a, "k", b, "k",
      depth = 4, width = 8, withExact = false).head()
    assert(tight.getLong(2) >= exact)
    assert(tight.isNullAt(3), "withExact=false must not run the join")
  }

  test("joinSizeEstimate: disjoint key sets report 0, never NULL or phantom mass") {
    val a = spark.range(0, 100).selectExpr("id AS k")
    val b = spark.range(100000, 100100).selectExpr("id AS k")
    // wide sketch: no bucket collides -> every depth's dot product is a
    // provable 0 and must participate in the min as 0
    val wide = CountMin.joinSizeEstimate(a, "k", b, "k",
      depth = 2, width = 1 << 16, withExact = true).head()
    assert(!wide.isNullAt(2) && wide.getLong(2) == 0L && wide.getLong(3) == 0L,
      s"got $wide")
    // even if SOME depth collides under a tight width, a single
    // collision-free depth pins the estimate to the true 0
    val tight = CountMin.joinSizeEstimate(a, "k", b, "k",
      depth = 6, width = 512, withExact = false).head()
    assert(tight.getLong(2) >= 0L)
  }

  test("joinSizeEstimate: nulls carry no join mass on either side") {
    import spark.implicits._
    val a = Seq[java.lang.Long](1L, 1L, null, 2L).toDF("k")
    val b = Seq[java.lang.Long](1L, null, null, 3L).toDF("k")
    val r = CountMin.joinSizeEstimate(a, "k", b, "k",
      depth = 3, width = 1 << 12, withExact = true).head()
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L, s"got $r")
  }
}
