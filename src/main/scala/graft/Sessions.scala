package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for this engine.
  *
  * - shuffle partitions sized to the local core count (not the 200 default —
  *   on a real cluster this would be tuned to ~2-3x total cores / AQE
  *   coalesces down);
  * - AQE on: runtime coalescing, skew-join splitting, broadcast demotion;
  * - UTC session timezone for oracle parity;
  * - legacy nanosAsLong so parquet TIMESTAMP(NANOS) (events.ts) is readable;
  *   [[graft.operators.Tables]] converts it back to a µs timestamp;
  * - NTZ inference OFF: driver testdata writes events.ts as
  *   TIMESTAMP(µs, isAdjustedToUTC=false), which would otherwise read as
  *   TIMESTAMP_NTZ — a type streaming watermarks reject. With the session
  *   timezone pinned UTC the TimestampType read is value-identical.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.plans.GraftExtensions.apply)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  /** Session for local tooling (Verify/Bench/tests): local[cpus]. */
  def local(cpus: Int, appName: String): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4))
      .appName(appName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def envCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
}
