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

  /** BAYESIAN-BOOTSTRAP confidence band for a mean (Rubin 1981) in ONE
    * pass: every replicate reweights each row by an Exponential(1) draw
    * — the Dirichlet-weight bootstrap, which unlike resampling needs NO
    * per-replicate data shuffle — and the replicate means' spread is
    * the uncertainty band. The "is this metric's move real" companion
    * to the point statistics (q52/q163): a 100 TB mean with an error
    * bar costs ONE extra scan, not B resamples.
    *
    * Determinism/portability: the exponential draw is
    * `−ln(u)` over the SEEDED portable uniform of `salt|replicate|id`
    * (the gumbelTopK/q160 PRNG contract — rerun-stable, salt-rotated);
    * per-row contributions round to 6 dp and sum as DECIMAL
    * (order-independent), one division per replicate. The whole band
    * replays in SQL.
    *
    * Scale shape: one explode(×B) + one replicate-keyed partial agg
    * whose map-side combine caps output at B rows per partition; the
    * exact mean rides a second scalar agg. Returns one row
    * `(n, mean, boot_lo, boot_hi)` — lo/hi are the min/max replicate
    * means (a B-replicate band; raise `replicates` for tail
    * percentiles).
    */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valCol: String,
      replicates: Int = 16, salt: String = "bs1"): DataFrame = {
    require(replicates >= 2 && replicates <= 64,
      s"replicates must be in [2, 64], got $replicates")
    val base = Parallelism.ensureCompute(df)
      .where(col(valCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        col(valCol).cast("double").as("__x"))
    val exact = base.agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast("string").cast("decimal(18,6)"))
        .cast("decimal(38,6)").as("__s"))
    val u = graft.functions.TextFunctions.portableUniform(
      concat(lit(salt), lit("|"), col("__r").cast("string"),
        lit("|"), col("__id")))
    val w = -log(u)
    val reps = base
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__r"))
      .select(col("__r"),
        round(w, 6).cast("decimal(18,6)").as("__w"),
        round(w * col("__x"), 6).cast("decimal(28,6)").as("__wx"))
      .groupBy(col("__r"))
      .agg(sum(col("__w")).cast("decimal(38,6)").as("__sw"),
        sum(col("__wx")).cast("decimal(38,6)").as("__swx"))
      .select(round(col("__swx").cast("double") / col("__sw").cast("double"), 6)
        .as("__m"))
      .agg(min(col("__m")).as("boot_lo"), max(col("__m")).as("boot_hi"))
    exact.crossJoin(reps).select(col("n"),
      round(col("__s").cast("double") / col("n").cast("double"), 6).as("mean"),
      col("boot_lo"), col("boot_hi"))
  }
}
