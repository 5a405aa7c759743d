package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group statistics: winsorized means (Tukey), median and
  * MAD — the outlier-resistant descriptive battery q52's moment
  * statistics can't give (one fat-finger price dominates a mean and
  * explodes a stddev; it moves a winsorized mean by one clamp width and
  * the MAD not at all). The pre-gate for numeric feature columns the
  * same way the Gopher signals gate text.
  *
  * Exactness/portability: percentile bounds are Spark's EXACT
  * interpolated `percentile` (== DuckDB `quantile_cont`, the q39/q129
  * agreement), rounded to 6 dp before use so every downstream value is
  * a pure function of portable numbers. Clamped values are rounded to
  * 2 dp (the money grain of the inputs) and summed through the
  * VARCHAR→DECIMAL route (order-independent, the q116 discipline);
  * each mean is one double division rounded 6 dp. MAD deviations
  * `|x − med|` are single IEEE subtractions.
  *
  * Scale shape: two aggregation passes over the data (bounds+median,
  * then clamp+means alongside the MAD's second percentile), each a
  * group-keyed shuffle of scalar columns; the bounds table is
  * group-count-sized and broadcasts back. No window, nothing
  * quadratic.
  */
object RobustStats {

  /** Per-group winsorized statistics. Returns one row per group:
    * `(keys..., n, p_lo, p_hi, med, mad, mean_raw, mean_wins)`.
    *
    * `lo`/`hi` are the clamp quantiles (defaults 0.05/0.95); rows below
    * `p_lo` count as `p_lo` in `mean_wins`, above `p_hi` as `p_hi`.
    */
  def winsorizedStats(df: DataFrame, keyCols: Seq[String], valCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(keyCols.nonEmpty, "winsorizedStats needs at least one key column")
    require(lo > 0.0 && hi < 1.0 && lo < hi,
      s"need 0 < lo < hi < 1, got ($lo, $hi)")
    Seq("p_lo", "p_hi", "med").foreach { c =>
      require(!df.columns.contains(c), s"input must not already contain '$c'")
    }
    val keys = keyCols.map(col)
    val bounds = df.groupBy(keys: _*).agg(
      round(expr(s"percentile($valCol, ${lo}d)"), 6).as("p_lo"),
      round(expr(s"percentile($valCol, ${hi}d)"), 6).as("p_hi"),
      round(expr(s"percentile($valCol, 0.5d)"), 6).as("med"))
    val joined = df.join(broadcast(bounds), keyCols)
    val dec = (c: Column) => round(c, 2).cast("string").cast("decimal(18,6)")
    val clamped = least(greatest(col(valCol), col("p_lo")), col("p_hi"))
    joined.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      min(col("p_lo")).as("p_lo"),
      min(col("p_hi")).as("p_hi"),
      min(col("med")).as("med"),
      round(expr(s"percentile(abs($valCol - med), 0.5d)"), 6).as("mad"),
      sum(dec(col(valCol))).cast("decimal(38,6)").as("__sraw"),
      sum(dec(clamped)).cast("decimal(38,6)").as("__sw"))
      .select(keys ++ Seq(col("n"), col("p_lo"), col("p_hi"), col("med"),
        col("mad"),
        round(col("__sraw").cast("double") / col("n").cast("double"), 6)
          .as("mean_raw"),
        round(col("__sw").cast("double") / col("n").cast("double"), 6)
          .as("mean_wins")): _*)
  }
}
