package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: project a sparse per-key daily series onto a
  * continuous date spine and forward-fill gaps (LOCF — last observation
  * carried forward). The standard shape behind retention dashboards,
  * balance snapshots and feature backfills, where "no row that day" must
  * read as "previous value", not NULL. No reference analog (its pipeline
  * is ingest-only); belongs to the analytics mandate.
  *
  * Scale design:
  *  - the spine is generated per key from that key's own [min, max] date
  *    (`sequence` + `explode`) — a narrow fan-out proportional to the
  *    key's span, never a cross join against a global calendar;
  *  - the fill is `last(value, ignoreNulls) OVER (PARTITION BY key ORDER
  *    BY date ROWS UNBOUNDED PRECEDING)` — a running frame, so Spark's
  *    WindowExec streams it with O(1) state per key, no per-key buffering;
  *  - one shuffle total (key): the spine agg, the left join back and the
  *    window all share the key partitioning, which AQE reuses.
  */
object TimeSeries {

  /** Densify `df`'s (key, date, value) onto each key's continuous daily
    * spine. Output: key, `dateCol` (every day in the key's span),
    * `observed` (0 on gap days) and `<valueCol>_filled` (LOCF; never null —
    * day one of each key is an observed row by construction of the span).
    * `df` must be pre-aggregated to one row per (key, date) — use
    * [[dailyAggregate]] for the raw-events front end.
    */
  def densifyDaily(
      df: DataFrame, keyCol: String, dateCol: String, valueCol: String): DataFrame = {
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr("interval 1 day")))
          .as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df.withColumn("__obs", lit(1L)), Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        coalesce(col("__obs"), lit(0L)).as("observed"),
        last(col(valueCol), ignoreNulls = true).over(w).as(s"${valueCol}_filled"))
  }

  /** One row per (key, day): a rounded sum of `valueCol`, rounded HERE,
    * before any fill copies it. The sum itself goes through DECIMAL — a
    * per-row cast at 9 dp (deterministic: a function of each value alone),
    * then an EXACT order-independent decimal sum — because round(sum of
    * doubles) can land on a rounding boundary and flip the last digit with
    * summation order (the q61/q96 bench-noise class); the decimal path is
    * bit-stable across engines and partitionings.
    */
  /** Gap-based DEBOUNCE: within each key, drop an event that follows its
    * predecessor (same key, (ts, tieBreak) order) by less than `minGap` —
    * the telemetry-ingest guard against retry storms and double-fires.
    * Gap is measured to the previous RAW event (one `lag`, one window
    * pass — O(1) state per row); the anchor-chained variant is the
    * sorted-sessionizer's job ([[graft.Sessions]]). Partition-by-key
    * window: the shuffle carries only the key + timestamp columns' rows
    * once, and at 100 TB per-key order is the same order any
    * event-stream op already needs.
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCol: String, minGapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    require(minGapMicros > 0, s"minGap must be positive, got $minGapMicros")
    require(!df.columns.contains("__prev_ts"),
      "input must not already contain a '__prev_ts' column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .where(col("__prev_ts").isNull ||
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(col("__prev_ts").cast("timestamp")) >= minGapMicros)
      .drop("__prev_ts")
  }

  def dailyAggregate(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      scale: Int = 3): DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(round(sum(col(valueCol).cast("decimal(18,9)")), scale)
        .cast("double").as(valueCol))

  /** DIVISION-FREE rolling z-score anomaly gate: flag a point whose
    * deviation from the mean of the previous `lookback` points (same key,
    * (ts, tie) order — the point itself EXCLUDED, so an outlier never
    * masks itself) exceeds `z` sample standard deviations. The classic
    * telemetry / fraud / sensor-spike monitor.
    *
    * The test `|v − mean| > z·stddev` (SAMPLE stddev, Bessel n−1
    * divisor — the estimator a z-gate over a finite window calls for)
    * is evaluated in EXACT integer arithmetic on `intCol` (the caller
    * scales values to integers, e.g. cents): with n = window count,
    * s1 = Σv, s2 = Σv², the inequality
    * `(v − s1/n)² > z² · (n·s2 − s1²)/(n(n−1))` clears denominators to
    *
    *   (v·n − s1)² · (n−1) > z² · n · (n·s2 − s1²)
    *
    * — both sides BIGINT, no mean/variance division, no sqrt, no float:
    * the flag is bit-identical across engines and partitionings (the
    * q135 divisionless-margin discipline applied to rolling stats).
    * Overflow contract: sound while max(4, z²) · lookback³ · max|v|²
    * < 2⁶³ — e.g. cents ≤ 10⁵, lookback ≤ 10², z ≤ 10 keeps both sides
    * under 10¹⁸.
    *
    * Scale shape: one partition-by-key window with a ROWS frame — Spark's
    * WindowExec streams it with O(lookback) state per key, one shuffle on
    * the key, no per-key materialization. Emits `n_window` (0 for the
    * key's first row) and `is_anomaly`; rows with n_window < `minN` are
    * never flagged (cold start).
    */
  def rollingAnomaly(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCol: String, intCol: Column, lookback: Int, minN: Int,
      z: Int): DataFrame = {
    require(keyCols.nonEmpty, "rollingAnomaly needs at least one key column")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    require(minN >= 2 && minN <= lookback,
      s"minN must be in [2, lookback], got $minN")
    require(z >= 1, s"z must be >= 1, got $z")
    Seq("__v", "__s1", "__s2").foreach { c =>
      require(!df.columns.contains(c), s"input must not already contain '$c'")
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
      .rowsBetween(-lookback, -1)
    val v = col("__v")
    val n = col("n_window")
    val s1 = col("__s1")
    val s2 = col("__s2")
    val dev = v * n - s1
    df.withColumn("__v", intCol.cast("long"))
      .withColumn("n_window", count(v).over(w))
      .withColumn("__s1", sum(v).over(w))
      .withColumn("__s2", sum(v * v).over(w))
      .withColumn("is_anomaly",
        n >= minN &&
          dev * dev * (n - lit(1L)) > lit(z.toLong * z) * n * (n * s2 - s1 * s1))
      .drop("__v", "__s1", "__s2")
  }

  /** SWEEP-LINE interval aggregation: per-key PEAK CONCURRENCY — the
    * maximum number of intervals `[start, end)` simultaneously open
    * (end EXCLUSIVE; pass `end + 1 unit` for inclusive semantics). The
    * interval-stabbing readout joins can't give without a quadratic
    * self-join: concurrent sessions, open orders, in-flight shipments,
    * overlapping GPU reservations.
    *
    * Algorithm: each interval explodes to two delta events (+1 at
    * start, −1 at end); deltas AGGREGATE per (key, ts) first — so
    * simultaneous opens/closes collapse into one net step and the
    * running sum is deterministic regardless of row order — then one
    * per-key ordered running sum, then a per-key max.
    *
    * Scale shape: the delta table is 2 rows × (key, ts, ±1) per
    * interval; one (key, ts)-keyed partial agg, one per-key window
    * (WindowExec streams the running frame with O(1) state), one
    * per-key partial-agg max. Never a global window, nothing quadratic;
    * a hot key costs its own timeline length, not its pairings.
    */
  def peakConcurrency(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "peakConcurrency needs at least one key column")
    val keys = keyCols.map(col)
    val deltas = df.select(keys :+ col(startCol).as("__ts") :+
        lit(1L).as("__d"): _*)
      .unionAll(df.select(keys :+ col(endCol).as("__ts") :+
        lit(-1L).as("__d"): _*))
    val stepped = deltas
      .groupBy(keys :+ col("__ts"): _*)
      .agg(sum(col("__d")).as("__step"))
      .withColumn("__open", sum(col("__step")).over(
        Window.partitionBy(keys: _*).orderBy(col("__ts").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
    stepped.groupBy(keys: _*).agg(max(col("__open")).as("peak"))
  }

  /** Per-group OLS TREND (simple linear regression y on x) from ONE
    * partial-agg moment pass — the "is this metric drifting up" readout
    * per key: slope, intercept and r² from the five classic moments
    * `(n, Σx, Σy, Σxy, Σx²[, Σy²])`. The same moments DuckDB's
    * `regr_*` family uses, computed here with EXACT arithmetic so the
    * result is partitioning-independent and replayable: x must be an
    * integer column (days since an epoch, not raw seconds — keeps
    * products in decimal range), y routes through the VARCHAR→DECIMAL
    * exact-sum path (q116); every numerator/denominator is an exact
    * integer/decimal, with three final IEEE divisions rounded 6 dp.
    *
    * `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`;
    * `intercept = (Σy − slope·Σx) / n` (using the ROUNDED slope — the
    * published pair stays self-consistent);
    * `r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))`, computed
    * in doubles from the exact moments (squares would overflow
    * decimal). Degenerate groups (all-same x, or zero y variance)
    * return NULL slope/intercept/r² via the same guards both engines
    * evaluate.
    *
    * Scale shape: ONE group-keyed partial-agg shuffle of six scalar
    * accumulators; output is group-table-sized. A 100 TB trend scan is
    * one pass.
    */
  def trendOls(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame =
    finishFit(trendMoments(df, keyCols, xCol, yCol), keyCols)

  /** The raw regression moments behind [[trendOls]], exposed for
    * INCREMENTAL maintenance: moments are ADDITIVE across disjoint
    * slices (days, shards, ingest batches), so yesterday's moment rows
    * plus today's delta equal the full-history fit bit-for-bit with
    * history never rescanned — the q91/q143 incremental discipline for
    * regression. Persist these per (key, slice); [[mergeTrendMoments]]
    * collapses them and finishes the fit.
    */
  def trendMoments(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "trendMoments needs at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("string").cast("decimal(18,6)")
    // x moments ride DECIMAL(38,0) end to end: epoch-scale x already
    // overflows the Long x·x product, and a 1e11-row Σx passes 2^63 —
    // the operand is widened BEFORE the multiply, not after
    val xd = x.cast("decimal(38,0)")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xd).cast("decimal(38,0)").as("sx"),
      sum(y).cast("decimal(38,6)").as("sy"),
      sum(y * x).cast("decimal(38,6)").as("sxy"),
      sum(xd * x).cast("decimal(38,0)").as("sxx"),
      sum(y * y).cast("decimal(38,12)").as("syy"))
  }

  /** Merge per-slice moment rows (counter addition — exact decimals, so
    * merged == from-scratch) and finish the [[trendOls]] fit with the
    * identical final arithmetic. `keyCols` are the fit keys; any extra
    * slice column (day, shard) is simply absent from the group-by and
    * folds away.
    */
  def mergeTrendMoments(moments: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeTrendMoments needs at least one key column")
    val agg = moments.groupBy(keyCols.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sx")).cast("decimal(38,0)").as("sx"),
      sum(col("sy")).cast("decimal(38,6)").as("sy"),
      sum(col("sxy")).cast("decimal(38,6)").as("sxy"),
      sum(col("sxx")).cast("decimal(38,0)").as("sxx"),
      sum(col("syy")).cast("decimal(38,12)").as("syy"))
    finishFit(agg, keyCols)
  }

  /** The shared final arithmetic of [[trendOls]]/[[mergeTrendMoments]]. */
  private def finishFit(agg: DataFrame, keyCols: Seq[String]): DataFrame = {
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("decimal(38,6)")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("decimal(38,12)")
    val slope = when(denx =!= 0L,
      round(num.cast("double") / denx.cast("double"), 6))
    agg
      .withColumn("slope", slope)
      .withColumn("intercept",
        when(col("slope").isNotNull,
          round((col("sy").cast("double") -
            col("slope") * col("sx").cast("double")) /
            col("n").cast("double"), 6)))
      .withColumn("r2",
        when(denx =!= 0L && deny =!= lit(0).cast("decimal(38,12)"),
          round(num.cast("double") * num.cast("double") /
            (denx.cast("double") * deny.cast("double")), 6)))
      .select(keyCols.map(col) ++
        Seq(col("n"), col("slope"), col("intercept"), col("r2")): _*)
  }

  /** OHLC RESAMPLING (downsampling to bars): per key and time bucket,
    * the first/max/min/last values — open/high/low/close — plus the bar
    * row count. First/last are exact `min_by`/`max_by` over the unique
    * `(ts, tieBreak)` order key (no window, no per-bar sort): ONE
    * partial-agg pass whose map-side combine reduces every partition to
    * bar-count rows, so a 100 TB tick table resamples in a single
    * bar-keyed shuffle. Values are selected, never arithmetically
    * combined — no float-summation order hazard.
    */
  def resampleOhlc(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCol: String, valueCol: String,
      bucket: String = "hour"): DataFrame = {
    require(keyCols.nonEmpty, "resampleOhlc needs at least one key column")
    require(Seq("year", "quarter", "month", "week", "day", "hour", "minute")
      .contains(bucket), s"unsupported bucket '$bucket'")
    val ord = struct(col(tsCol), col(tieBreakCol))
    df.groupBy(keyCols.map(col) :+
        date_trunc(bucket, col(tsCol)).as("bucket"): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }
}
