package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class AvroIOSpec extends SparkSuite {
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("graft_avro").resolve("t").toString

  test("round-trip: all supported types incl. nulls, binary, arrays, temporal") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType, nullable = true),
      StructField("small", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BinaryType, nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("at", TimestampType, nullable = true),
      StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = true)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, true, 42, 1.5f, 2.25, "it's a \\ test", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-02-29"), ts, Seq(1.0, -2.5)),
      Row(2L, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val p = dir()
    AvroIO.write(df, p)
    val back = AvroIO.read(spark, p)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)), s"schema drifted: ${back.schema}")
    val got = back.orderBy("id").collect()
    assert(got.length == 2)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getBoolean(1) && r.getInt(2) == 42)
    assert(r.getFloat(3) == 1.5f && r.getDouble(4) == 2.25)
    assert(r.getString(5) == "it's a \\ test")
    assert(r.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getDate(7) == java.sql.Date.valueOf("2024-02-29"))
    assert(r.getTimestamp(8) == ts, s"micros lost: ${r.getTimestamp(8)}")
    assert(r.getSeq[Double](9) == Seq(1.0, -2.5))
    assert((1 until 10).forall(got(1).isNullAt), "null row must round-trip null")
  }

  test("read fans out one task per file; empty partitions keep the schema") {
    val df = spark.range(0, 1000, 1, 8).select(col("id"),
      (col("id") % 7).cast("int").as("m"))
    val p = dir()
    AvroIO.write(df, p)
    val files = new java.io.File(p).listFiles.count(_.getName.endsWith(".avro"))
    assert(files == 8, s"one container file per partition, got $files")
    val back = AvroIO.read(spark, p)
    assert(back.rdd.getNumPartitions == 8, "a task per file, the scan shape")
    assert(back.agg(sum("id")).head.getLong(0) == 499500L)
    // all-empty write still reads back with the schema
    val p2 = dir()
    AvroIO.write(df.where(lit(false)), p2)
    val empty = AvroIO.read(spark, p2)
    assert(empty.columns.toSeq == Seq("id", "m") && empty.count() == 0)
  }

  test("unsupported types fail fast; explicit schema overrides inference") {
    val dec = spark.range(3).select(col("id").cast("decimal(10,2)").as("x"))
    intercept[IllegalArgumentException] { AvroIO.write(dec, dir()) }
    val df = spark.range(5).select(col("id"))
    val p = dir()
    AvroIO.write(df, p)
    val asGiven = AvroIO.read(spark, p,
      Some(StructType(Seq(StructField("id", LongType, nullable = true)))))
    assert(asGiven.schema.head.nullable)
  }
}
