package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.Observation

/** Zero-cost stage observability: named metrics computed INSIDE an
  * already-running action (`Dataset.observe`), not by a second scan. The
  * reference introspects stage payloads by printing them between tasks
  * (`themovies.py:66,90`) — free on a driver-resident dict, but on a
  * distributed engine any such stage introspection is a SECOND action
  * over the data. This is the Spark-native equivalent: the aggregates
  * ride along with whatever action the caller runs, at shuffle-free
  * accumulator cost.
  *
  * Usage: `val (stamped, obs) = Metrics.observed(df, "ingest", count(lit(1)).as("rows"))`
  * → run any action on `stamped` → `obs.get("rows")`. Only
  * accumulator-safe aggregates (count/sum/min/max/avg — no distinct) are
  * accepted by Spark here, which is exactly what keeps it free at 100 TB.
  */
object Metrics {

  /** Attach named observed metrics to a stage; returns the instrumented
    * DataFrame and the handle to read after the next action completes.
    */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric required")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Inter-rater AGREEMENT between two boolean labelers over the same
    * rows (Cohen 1960): the full confusion matrix plus observed
    * agreement p_o, chance agreement p_e, and kappa
    * `(p_o − p_e)/(1 − p_e)`. The audit run before swapping one quality
    * / language / toxicity filter for another at corpus scale — raw
    * agreement overstates concordance when the label base rates are
    * skewed, which is exactly what kappa corrects.
    *
    * One partial-agg pass (count + four conditional sums, map-side
    * combined), 1-row output. Counts are exact BIGINT; p_o, p_e and
    * kappa are fixed chains of IEEE ops on them (p_e's numerator stays
    * in integer products), rounded 6 dp at the end — engine-portable.
    * Degenerate p_e = 1 (both raters constant and equal) yields NULL
    * kappa via the same CASE on both engines. Rows where EITHER labeler
    * abstained (null) are excluded up front — they land in no confusion
    * cell, so counting them in n would silently deflate p_o and p_e.
    */
  import org.apache.spark.sql.functions._
  def agreement(df: DataFrame, a: Column, b: Column): DataFrame = {
    val base = df.select(a.cast("boolean").as("la"), b.cast("boolean").as("lb"))
      .where(col("la").isNotNull && col("lb").isNotNull)
    def cell(x: Boolean, y: Boolean): Column =
      sum(when(col("la") === x && col("lb") === y, 1L).otherwise(0L))
    val agg = base.agg(count(lit(1)).as("n"),
      cell(false, false).as("n00"), cell(false, true).as("n01"),
      cell(true, false).as("n10"), cell(true, true).as("n11"))
    val n = col("n").cast("double")
    val po = (col("n00") + col("n11")).cast("double") / n
    val pe = ((col("n00") + col("n01")) * (col("n00") + col("n10")) +
      (col("n10") + col("n11")) * (col("n01") + col("n11"))).cast("double") / (n * n)
    agg.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
      round(po, 6).as("p_o"), round(pe, 6).as("p_e"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }
}
