package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling: per-column row/null/exact-distinct counts
  * and min/max — the first query anyone runs against an unfamiliar table,
  * and the statistics backbone of data-quality monitoring (the
  * reference's catalog introspection, `queries.py:6-34`, stops at schema;
  * this profiles the VALUES). Related: [[Quality]] checks rows against
  * expectations; this summarizes distributions so you know what to expect.
  *
  * Scale design: ONE aggregation over ONE scan computes every column's
  * stats simultaneously (never one job per column — a k-column profile of
  * a 100 TB table must not cost k scans); the per-column rows come from a
  * metadata-only unpivot of the single result row. Exact multi-column
  * distinct counts make Spark plan an Expand (k rows per input row,
  * partial-aggregated map-side) — the documented price of EXACT
  * cardinalities; swap `countDistinct` for `approx_count_distinct` when
  * estimates suffice at scale.
  */
object Profile {

  /** One row per profiled column: n_rows, n_nulls, n_distinct (exact,
    * nulls excluded), min/max rendered as strings (the only type that
    * unions across heterogeneous columns).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** SKETCH-BASED profile for the 100 TB path: [[profile]]'s exact
    * `countDistinct` costs an Expand (k rows per input row); this
    * variant reads cardinality from the md5-portable
    * [[graft.plans.SketchAggregates.BottomKSketch]] KMV sketch instead
    * — O(k) state per column, EXACT under k distinct values (the
    * sketch holds them all), `(k-1)*2^48 / theta` beyond (theta = the
    * k-th smallest 48-bit hash prefix, the [[Scale.kmvOverlapEstimate]]
    * estimator). Deterministic and engine-portable, so the q194 oracle
    * replays the ESTIMATES bit-for-bit, not a tolerance band.
    */
  def tableProfile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(k >= 16, s"k must be >= 16 for a usable distinct estimate, got $k")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in ${df.columns.toSeq}")
    import graft.plans.SketchAggregates.bottom_k
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        bottom_k(col(c).cast("string"), k).as(s"__kmv_$c"))
    }
    val row = Parallelism.ensureCompute(df).agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      row.select(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        round(col(s"__nulls_$c").cast("double") /
          greatest(lit(1L), col("__n")), 6).as("null_rate"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        distinctEst(col(s"__kmv_$c"), k).as("distinct_est"))
    }.reduce(_ unionByName _)
  }

  /** KMV readout: exact sketch size under k distinct; the θ estimator
    * at k, rounded 4 dp (the [[Scale.kmvOverlapEstimate]] arithmetic —
    * same hex fold, same constants, so the same oracle replay).
    */
  private def distinctEst(kmv: Column, k: Int): Column = {
    val theta = aggregate(
      filter(split(substring(md5(element_at(kmv, k)), 1, 12), ""), c => c =!= ""),
      lit(0L), (acc, c) => acc * 16L + (instr(lit("0123456789abcdef"), c) - 1L))
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) * 281474976710656.0 /
        theta.cast("double"), 4))
  }
}
