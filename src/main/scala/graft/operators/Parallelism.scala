package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive minimum-parallelism guard for compute- and shuffle-heavy
  * operators.
  *
  * Parquet scan parallelism is row-group-bounded: a file with one row group
  * yields ONE input partition no matter how small
  * `spark.sql.files.maxPartitionBytes` is, so every downstream narrow stage
  * (shingling, hashing, map-side partial aggregation) runs on a single core.
  * That is exactly the layout the driver testdata ships (one file, one row
  * group per table) — and single-writer pipelines produce it in the wild too.
  *
  * `ensure` repartitions ONLY when the input's actual partition count is
  * below the session's parallelism. On a healthy 100 TB layout (thousands of
  * row groups) it is a no-op, so filter pushdown and scan pruning are
  * untouched; on a degenerate layout it trades one round-robin shuffle of
  * the raw input for full-cluster parallelism in everything downstream —
  * and in the degenerate case the pushdown it bypasses could not have
  * skipped anything anyway (one row group = one stats bucket).
  */
object Parallelism {

  /** Planned-partition counts memoized by (session, canonicalized-plan
    * semantic hash): `df.rdd.getNumPartitions` runs full physical planning
    * (file listing included) of the input, and `ensure` sits on hot operator
    * paths that probe the same table loads over and over. The count is a
    * parallelism DECISION input, not a correctness input — a stale entry
    * (e.g. the same path re-read after a sink swap grew it) costs at most a
    * suboptimal repartition choice — so a plain bounded cache is safe.
    */
  private val partitionCounts =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Int]()

  private def plannedPartitions(df: DataFrame): Int = {
    val key = (System.identityHashCode(df.sparkSession).toString,
      df.queryExecution.logical.canonicalized.semanticHash())
    if (partitionCounts.size > 4096) partitionCounts.clear()
    partitionCounts.computeIfAbsent(key, _ => df.rdd.getNumPartitions)
  }

  /** Repartition `df` up to the default parallelism if its planned partition
    * count is lower and its estimated size exceeds `minBytes` (tiny dims are
    * cheaper single-partition than shuffled).
    *
    * Streaming DataFrames are returned untouched (no RDD to inspect; micro-
    * batch parallelism is the source's concern).
    */
  def ensure(df: DataFrame, minBytes: Long = 1L << 20): DataFrame = {
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = plannedPartitions(df)
    if (have >= want) return df
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < minBytes) df else df.repartition(want)
  }

  /** `ensure` for per-row compute so heavy that even a tiny input is worth
    * spreading (minhash shingling, simhash folds, codec decode).
    */
  def ensureCompute(df: DataFrame): DataFrame = ensure(df, minBytes = 0L)
}
