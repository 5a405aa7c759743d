package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table sinks mirroring the reference's two load paths plus the XCom
  * stage-handoff (§2.1 S3/S4/S7, §3.3).
  */
object Sinks {

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Existence probe — and the self-healing half of [[swapInto]]'s crash
    * contract: a crash between swapInto's two renames leaves no live table
    * but a complete `.old` backup; the next probe detects exactly that
    * state (dest absent + `.old` present) and restores the backup before
    * answering, so readers see the pre-swap table rather than nothing.
    */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark)
    val dest = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    if (!f.exists(dest) && f.exists(bak)) f.rename(bak, dest)
    f.exists(dest)
  }

  /** The append path (`write_dataframe`, etl.py:27-86): dedup; if the table
    * does not exist, create it from the batch schema; else resolve schema
    * drift (added columns / type sidecars) against the existing table and
    * append. Drift against a parquet destination rewrites the table once
    * with the evolved schema (the analog of ALTER TABLE ADD COLUMN; a
    * metadata-only DDL on a warehouse-format sink).
    */
  def appendInto(spark: SparkSession, destPath: String, batch: DataFrame): Unit = {
    val stamped = Audit.stamp(Dedup.fullRow(batch))
    if (!tableExists(spark, destPath)) {
      stamped.write.mode("overwrite").parquet(destPath)
    } else {
      val dest = spark.read.parquet(destPath)
      val (destAligned, batchAligned) = SchemaDrift.align(dest, stamped)
      if (SchemaDrift.diff(dest.schema, stamped.schema).isDrifted) {
        // evolved schema: rewrite once via staging swap, then the appended
        // batch lands in the new layout
        swapInto(spark, destPath, destAligned.unionByName(batchAligned))
      } else {
        batchAligned.write.mode("append").parquet(destPath)
      }
    }
  }

  /** Atomic-ish write-new-then-swap for full-table rewrites. Plain parquet
    * has no transactional commit, so the swap is two directory renames
    * with a crash window between them: a failure after `dest -> .old` but
    * before `.staging -> dest` leaves NO live table — only the complete
    * `.old` backup. [[tableExists]] self-heals that state (restores `.old`
    * as the table) on the next probe. A table format with an atomic commit
    * (Delta/Iceberg) is the production replacement for this whole seam.
    */
  def swapInto(spark: SparkSession, destPath: String, data: DataFrame): Unit = {
    val f = fs(spark)
    val dest = new org.apache.hadoop.fs.Path(destPath)
    val tmp = new org.apache.hadoop.fs.Path(destPath + ".staging")
    val bak = new org.apache.hadoop.fs.Path(destPath + ".old")
    data.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(bak)) f.delete(bak, true)
    if (f.exists(dest)) f.rename(dest, bak)
    f.rename(tmp, dest)
    f.delete(bak, true)
  }

  /** Inter-stage handoff (S3): the reference shuttles rows between Airflow
    * tasks via XCom; in one SparkSession the lazy plan needs no handoff at
    * all, and a durable checkpoint between pipeline stages is a parquet
    * round-trip (also truncates lineage for iterative jobs).
    */
  def handoff(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
