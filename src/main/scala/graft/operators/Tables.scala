package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver testdata layout (TESTDATA.md):
  * one parquet file per table under the per-scale-factor testdata dirs.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
  * [[graft.Sessions]]) and the loader converts the nano-long back to a
  * microsecond TimestampType (integer `div` — no double precision loss on
  * 1e18-scale epochs). The driver testdata is µs-valued, so truncation is
  * lossless and matches DuckDB's µs comparisons.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNanoTs(spark.read.parquet(s"$dir/$name.parquet"), "ts")

  /** If `c` was read as a nanos-long (legacy nanosAsLong), convert to µs timestamp. */
  def normalizeNanoTs(df: DataFrame, c: String): DataFrame =
    if (df.schema.fields.exists(f => f.name == c && f.dataType == LongType)
        && df.schema.fieldNames.contains("event_id"))
      df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
    else df
}
