package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DDSketch — relative-error quantiles with a MERGEABLE, DETERMINISTIC
  * sketch (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019).
  *
  * Positive values land in logarithmic buckets
  * `idx = ceil(ln(v) / ln(gamma))`, `gamma = (1+alpha)/(1-alpha)`; the
  * bucket's representative `2·gamma^idx / (gamma+1)` is within relative
  * error `alpha` of every value it holds. Zeros get the reserved bucket
  * NULL-index 0-count path (`__zeros`), negatives are rejected (mirror
  * them in caller space — the standard DDSketch deployment).
  *
  * Why THIS sketch completes the family: unlike GK (rank error, merge
  * order sensitive) and t-digest (centroid placement depends on input
  * order), the DDSketch bucket of a value is a PURE FUNCTION of the
  * value — so the sketch of a union is exactly the counter-sum of the
  * sketches (the q101/q143 incremental discipline), partitioning cannot
  * change it, and a DuckDB oracle replays every bucket and every
  * quantile readout bit-for-bit. At 100 TB: one partial-agg shuffle of
  * (group, bucket) rows — bucket count is ~log-range/alpha (hundreds),
  * so the sketch table is group-count × hundreds regardless of input
  * rows, and yesterday's sketch plus today's delta IS the full-history
  * sketch with history never rescanned.
  */
object QuantileSketch {

  private def gammaOf(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Per-group DDSketch: `(groupCols..., bucket, cnt)` rows plus the
    * zero-bucket as `bucket = NULL` (log has no zero bucket). One
    * map-side-combined shuffle. NULL values carry no distribution mass
    * and are dropped (the [[graft.operators.Drift.ksStatistic]] ECDF
    * convention); NEGATIVE values fail fast rather than silently skew
    * a percentile — mirror them in caller space first.
    */
  def sketch(df: DataFrame, valueCol: String, groupCols: Seq[String],
      alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val gamma = gammaOf(alpha)
    val v = col(valueCol).cast("double")
    val bucket =
      when(v < 0.0, raise_error(lit(
        s"ddsketch: negative value in $valueCol; mirror negatives before sketching"))
        .cast("long"))
      .when(v > 0.0, ceil(log(v) / lit(math.log(gamma))).cast("long"))
      .otherwise(lit(null).cast("long")) // v == 0: the reserved zero bucket
    df.where(v.isNotNull)
      .select((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__alpha", lit(alpha))
  }

  /** Every readout must run at the alpha the sketch was BUILT with —
    * a mismatched alpha changes `gamma` and yields plausible-looking
    * but wrong representative values with no error. The sketch table
    * carries its alpha as the `__alpha` column; this guard (folded into
    * each readout's `cnt` so every row evaluates it) fails fast on a
    * mismatch instead of silently lying.
    */
  private def guardedCnt(alpha: Double) =
    // null-safe inequality: a NULL __alpha (e.g. rows merged in from a
    // pre-alpha-column table via schema merge) must RAISE, not silently
    // bypass the guard
    when(!(col("__alpha") <=> lit(alpha)), raise_error(concat(
      lit("ddsketch: readout alpha "), lit(alpha),
      lit(" != sketch alpha "), coalesce(col("__alpha").cast("string"),
        lit("NULL")),
      lit(" — pass the alpha the sketch was built with")))
      .cast("long"))
      .otherwise(col("cnt"))

  /** WEIGHTED sketch: each row contributes `weightCol` (a non-negative
    * integer — token counts, byte sizes, replication factors) instead
    * of 1, so [[quantiles]] reads out WEIGHT-MASS percentiles — "the
    * median TOKEN lives in a document of length X", the statistic a
    * training-mix designer actually wants (row-median flatters the
    * short-document tail). Same purity: the bucket of a value ignores
    * the weight, so merge == from-scratch and the oracle replays
    * weighted counts exactly.
    */
  def sketchWeighted(df: DataFrame, valueCol: String, weightCol: String,
      groupCols: Seq[String], alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val gamma = gammaOf(alpha)
    val v = col(valueCol).cast("double")
    val w = col(weightCol).cast("long")
    val bucket =
      when(v < 0.0, raise_error(lit(
        s"ddsketch: negative value in $valueCol; mirror negatives before sketching"))
        .cast("long"))
      .when(v > 0.0, ceil(log(v) / lit(math.log(gamma))).cast("long"))
      .otherwise(lit(null).cast("long"))
    val wGuard =
      when(w < 0L, raise_error(lit(
        s"ddsketch: negative weight in $weightCol")).cast("long")).otherwise(w)
    df.where(v.isNotNull && w.isNotNull && w =!= 0L)
      .select((groupCols.map(col) :+ bucket.as("bucket") :+
        wGuard.as("__w")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("__w")).as("cnt"))
      .withColumn("__alpha", lit(alpha))
  }

  /** Merge sketch tables (counter addition — merged == from-scratch,
    * exactly; the q91/q143 incremental contract for percentiles).
    */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"),
        min(col("__alpha")).as("__amin"), max(col("__alpha")).as("__amax"))
      // sketches built at different alphas have incompatible bucket
      // meanings — counter addition across them is nonsense; fail fast
      .withColumn("__alpha",
        when(col("__amin") =!= col("__amax"), raise_error(lit(
          "ddsketch merge: sketches built with different alphas"))
          .cast("double"))
        .otherwise(col("__amax")))
      .drop("__amin", "__amax")

  /** Sketch-space 1-Wasserstein: W1 between the two discrete
    * distributions that place each DDSketch bucket's mass at its
    * representative value — [[graft.operators.Drift.wasserstein1]]'s
    * mergeable/streaming sibling. Within the sketch's `alpha` relative
    * error of the exact W1, but computed from two FIXED-SIZE tables:
    * at 100 TB each side is a streaming-maintained (or merged
    * per-shard) sketch and the distance costs nothing — the drift
    * monitor you leave running, with the exact staircase reserved for
    * investigation. Inputs are ungrouped sketch tables
    * ((bucket, cnt) as [[sketch]] emits with `groupCols = Nil`);
    * returns one row (n_a, n_b, w1).
    *
    * The staircase here IS a single-partition window — over the
    * sketch table, whose size is bounded by log-range/alpha (hundreds
    * of rows) BY CONSTRUCTION, never by the corpus. Representatives
    * are rounded to 6 dp first (two sub-resolution buckets that round
    * together merge their mass — value-identical staircase steps),
    * then the q206 exact-integer gap arithmetic replays unchanged.
    */
  def sketchW1(a: DataFrame, b: DataFrame, alpha: Double = 0.01): DataFrame = {
    val gamma = gammaOf(alpha)
    def repped(df: DataFrame, ca: String, cb: String) = df.select(
      round(when(col("bucket").isNull, lit(0.0))
        .otherwise(lit(2.0) * pow(lit(gamma), col("bucket").cast("double")) /
          lit(gamma + 1.0)), 6).as("v"),
      guardedCnt(alpha).as(ca), (col("cnt") * 0L).as(cb))
    val perV = repped(a, "ca", "cb").unionByName(repped(b, "cb", "ca"))
      .groupBy(col("v")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val spark = a.sparkSession
    val Array(tot) = perV.agg(sum(col("ca")), sum(col("cb"))).collect()
    require(!tot.isNullAt(0) && !tot.isNullAt(1),
      "both sketches must carry mass, got empty input")
    val (na, nb) = (tot.getLong(0), tot.getLong(1))
    require(na > 0 && nb > 0, s"both sketches must carry mass, got ($na, $nb)")
    require(na < (1L << 31) && nb < (1L << 31),
      s"sketch W1's exact integer gaps need < 2^31 rows per side, got ($na, $nb) — " +
        "pre-scale counts (divide both sides' cnt by a common factor) beyond that")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val termSum = perV
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("nextv", lead(col("v"), 1).over(w))
      .where(col("nextv").isNotNull)
      .agg(coalesce(
        sum(round((col("nextv") - col("v")) *
          abs(col("cuma") * nb - col("cumb") * na).cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(38, 6))),
        lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("s"))
      .head().getDecimal(0)
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(na, nb, termSum.toString)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType, nullable = false))))
      .select(col("n_a"), col("n_b"),
        round(col("s").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("w1"))
  }

  /** Per-GROUP sketch-space drift report — [[sketchW1]]'s staircase
    * over grouped sketch tables ((groupCols..., bucket, cnt) as
    * [[sketch]] emits), emitting BOTH readouts the one pass already
    * prices: one row `(groupCols..., n_a, n_b, w1, ks)` per group
    * present on BOTH sides (a one-sided group has no defined transport
    * distance — surface those by anti-joining the inputs). `w1` is the
    * transport distance (how FAR the mass moved); `ks` is the sup ECDF
    * gap at bucket resolution (the LARGEST displaced fraction) — the
    * exact KS of the quantized distributions, within one bucket's mass
    * of the true KS; `psi` is the population stability index over the
    * SHARED buckets ([[Drift.psiBins]]'s smoothing-free form on the
    * sketch's log-spaced bins) — NULL when the two sides share no
    * bucket at all, because the true PSI is then infinite and a 0
    * would lie. This is the standing fleet monitor shape:
    * per-segment drift from per-segment fixed-size state, fully
    * distributed — the staircase windows partition BY GROUP over
    * sketch-sized rows, totals are a second tiny agg, and nothing ever
    * touches the driver. Same arithmetic contract as [[sketchW1]]:
    * exact while every group holds < 2³¹ rows per side (beyond that,
    * pre-scale counts by a common factor — the distances are
    * ratio-invariant).
    */
  def sketchDriftReport(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      alpha: Double = 0.01): DataFrame = {
    require(groupCols.nonEmpty, "use sketchW1 for the ungrouped case")
    val gamma = gammaOf(alpha)
    val g = groupCols.map(col)
    def repped(df: DataFrame, ca: String, cb: String) = df.select(
      g :+
        round(when(col("bucket").isNull, lit(0.0))
          .otherwise(lit(2.0) * pow(lit(gamma), col("bucket").cast("double")) /
            lit(gamma + 1.0)), 6).as("v") :+
        guardedCnt(alpha).as(ca) :+ (col("cnt") * 0L).as(cb): _*)
    val perV = repped(a, "ca", "cb").unionByName(repped(b, "cb", "ca"))
      .groupBy(g :+ col("v"): _*)
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val tot = perV.groupBy(g: _*)
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
      .where(col("n_a") > 0 && col("n_b") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("v"))
    val terms = perV
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("nextv", lead(col("v"), 1).over(w))
      .where(col("nextv").isNotNull)
      .join(tot, groupCols)
      .groupBy(g: _*)
      .agg(
        sum(round((col("nextv") - col("v")) *
          abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")).cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("s"),
        max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a"))).as("ksn"))
    val psi = perV.where(col("ca") > 0 && col("cb") > 0)
      .join(tot, groupCols)
      .groupBy(g: _*)
      .agg(sum(round(
        (col("ca").cast("double") / col("n_a") -
          col("cb").cast("double") / col("n_b")) *
          log((col("ca") * col("n_b")).cast("double") /
            (col("cb") * col("n_a")).cast("double")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("psum"))
    // left join from totals: a group whose staircase has no interior
    // steps (all mass on one value) still reports, with w1 = 0 (and
    // ks = 0: identical quantized mass placement); psi stays NULL when
    // no bucket is shared
    tot.join(terms, groupCols, "left")
      .join(psi, groupCols, "left")
      .select(g :+ col("n_a") :+ col("n_b") :+
        round(coalesce(col("s"),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("w1") :+
        round(coalesce(col("ksn"), lit(0L)).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("ks") :+
        round(col("psum").cast("double"), 6).as("psi"): _*)
  }

  /** Quantile readout: for each q, the representative of the bucket
    * holding rank `floor(q·(n−1))` in bucket order (zeros first — the
    * NULL bucket sorts lowest, matching value order since every other
    * bucket holds positives). Returns one row per (group, q):
    * `(groupCols..., q, est)` with `est` rounded 6 dp — the whole
    * readout is a prefix sum over the sketch TABLE (hundreds of rows
    * per group), never over the data.
    */
  def quantiles(sketchDf: DataFrame, groupCols: Seq[String],
      qs: Seq[Double], alpha: Double = 0.01): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $qs")
    val gamma = gammaOf(alpha)
    // bucket order: NULL (zeros) first == smallest values first
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket").asc_nulls_first)
    val cum = sketchDf
      .withColumn("cnt", guardedCnt(alpha))
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)))
    val spark = sketchDf.sparkSession
    import spark.implicits._
    val qDf = qs.toDF("q")
    // rank of quantile q in 0-based order: floor(q * (n - 1)); the
    // covering bucket is the first with cum > rank. The cross join is a
    // bounded broadcast: |qs| rows against the sketch table.
    cum.crossJoin(broadcast(qDf))
      .where(col("cum") - col("cnt") <= floor(col("q") * (col("n") - 1)) &&
        floor(col("q") * (col("n") - 1)) < col("cum"))
      .select((groupCols.map(col) :+ col("q") :+
        round(when(col("bucket").isNull, lit(0.0))
          .otherwise(lit(2.0) * pow(lit(gamma), col("bucket").cast("double")) /
            lit(gamma + 1.0)), 6).as("est")): _*)
  }
}
