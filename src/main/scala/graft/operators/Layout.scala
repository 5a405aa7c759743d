package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Data-layout management — the scan-side half of 100 TB performance.
  *
  * Three layouts, three pruning levers:
  *  - [[writePartitioned]]: hive-style directory partitioning. A filter on
  *    the partition column prunes whole directories at PLANNING time
  *    (`PartitionFilters` / `PartitionCount` in the scan node) — zero IO
  *    for excluded partitions, the coarsest and cheapest skip.
  *  - [[writeClustered]]: range-repartition + sort-within-partitions on a
  *    cluster key. Each output file covers a DISJOINT key range, so parquet
  *    footer min/max statistics make any key predicate skip all but the
  *    covering files at READ time (row-group pruning) — the lever for
  *    high-cardinality keys where directory-per-value would melt the
  *    metastore.
  *  - [[compact]]: bin-pack many small files into ~`targetBytes` files via
  *    the staging swap. Streaming/append sinks accrete small files; at
  *    scale, scan task count (and scheduler pressure) tracks file count,
  *    so periodic compaction is part of the sink contract, not an
  *    afterthought.
  */
object Layout {

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Hive-partitioned parquet write (dirs per partition-column value). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Range-clustered write: `numFiles` files with disjoint, sorted key
    * ranges (parquet min/max stats become maximally selective on the key).
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Parquet data files under a table path (recursive — covers hive
    * partition subdirectories).
    */
  def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val f = fs(spark)
    val it = f.listFiles(new Path(path), true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith("."))
        buf += ((s.getPath.toString, s.getLen))
    }
    buf.toSeq
  }

  /** Rewrite a table into ceil(totalBytes / targetBytes) files (>= 1) via
    * the write-new-then-swap path. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val before = dataFiles(spark, path)
    val totalBytes = before.map(_._2).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    Sinks.swapInto(spark, path, spark.read.parquet(path).coalesce(n))
    (before.size, dataFiles(spark, path).size)
  }
}
