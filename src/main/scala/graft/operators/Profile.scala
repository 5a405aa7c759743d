package graft.operators

import org.apache.spark.sql.DataFrame
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
}
