package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Tables
import graft.plans.SketchAggregates.bottom_k

/** BottomKSketch: deterministic bottom-k-by-md5 sample — equals the
  * brute-force definition, invariant to partitioning (so the partial/merge
  * path is value-identical to single-pass), bounded buffer semantics.
  */
class SketchAggregatesSpec extends SparkSuite {

  private def customer = Tables.load(spark, sf, "customer")
    .select(col("c_mktsegment"), col("c_name"))

  test("bottom_k == brute-force distinct-order-by-md5 per group") {
    val sketch = customer.groupBy(col("c_mktsegment"))
      .agg(bottom_k(col("c_name"), 5).as("sample"))
      .select(col("c_mktsegment"), posexplode(col("sample")).as(Seq("pos", "name")))
    val brute = customer.distinct()
      .withColumn("h", md5(col("c_name")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_mktsegment")).orderBy(col("h"))))
      .where(col("rk") <= 5)
      .select(col("c_mktsegment"), (col("rk") - 1).cast("int").as("pos"), col("c_name").as("name"))
    assert(sketch.collect().toSet === brute.collect().toSet)
  }

  test("partition-invariant: 1 partition == 13 partitions") {
    val one = customer.repartition(1).groupBy(col("c_mktsegment"))
      .agg(bottom_k(col("c_name"), 7).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val many = customer.repartition(13).groupBy(col("c_mktsegment"))
      .agg(bottom_k(col("c_name"), 7).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(one === many)
  }

  test("k >= distinct returns all values; nulls and duplicates ignored") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("a", null), ("b", "z"))
      .toDF("g", "v")
    val out = df.groupBy($"g").agg(bottom_k($"v", 100).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out === Map("a" -> Set("x", "y"), "b" -> Set("z")))
  }

  test("global (no grouping) sketch with map-side combine") {
    val n = customer.agg(bottom_k(col("c_name"), 3).as("s"))
      .select(size(col("s"))).head().getInt(0)
    assert(n === 3)
  }

  test("streaming: sketch accumulates incrementally across micro-batches == batch") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-stream").toString
    // 6 files -> 6 micro-batches: state-store serialize/merge exercised.
    customer.repartition(6).write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream
      .schema(customer.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = streamIn.groupBy(col("c_mktsegment"))
      .agg(bottom_k(col("c_name"), 5).as("s"))
      .writeStream.outputMode("complete").format("memory").queryName("sketch_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sketch_out")
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val batch = customer.groupBy(col("c_mktsegment"))
        .agg(bottom_k(col("c_name"), 5).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("SQL surface: bottom_k registered via SparkSessionExtensions") {
    customer.createOrReplaceTempView("sketch_customer")
    val sql = spark.sql(
      "SELECT c_mktsegment, bottom_k(c_name, 5) AS s FROM sketch_customer GROUP BY c_mktsegment")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val api = customer.groupBy(col("c_mktsegment"))
      .agg(bottom_k(col("c_name"), 5).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sql === api)
  }
}
