package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity auditing and enforcement over quasi-identifier columns
  * (Sweeney 2002 — public method): a row is re-identifiable when its
  * combination of quasi-identifiers (the columns an attacker can link to
  * external data: region, segment, coarse account ranges, ...) is shared
  * by fewer than k rows. The reference pipeline ships PII columns around
  * with no release gate (`etl.py` moves raw customer rows verbatim);
  * a training-data pipeline that exports anything user-derived needs
  * this check in front of the sink, next to the text-level redaction
  * battery (q60).
  *
  * Both operators are one partial-agg `groupBy(quasiCols)` count — the
  * group table is quasi-combination-sized, orders of magnitude smaller
  * than the data — joined back BROADCAST. No window over the full table,
  * no per-row state; at 100 TB the cost is one shuffle of the quasi
  * columns' key bytes.
  */
object Privacy {

  /** Per-group audit: every quasi-identifier combination with its row
    * count and `at_risk = count < k`. The release decision input.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Enforcement by SUPPRESSION: rows in groups below k keep every other
    * column but have ALL quasi-identifier columns nulled (the standard
    * full-suppression cell: partial suppression would leak the remaining
    * quasi values' joint distribution). A `suppressed` flag is appended
    * so downstream mixers can weigh or drop the generalized rows.
    *
    * NULL quasi values group as their own combination (SQL GROUP BY
    * semantics) — an all-NULL combination of size >= k is already
    * anonymous by construction.
    */
  /** Differentially-private histogram RELEASE via the Laplace mechanism
    * (Dwork/McSherry/Nissim/Smith 2006): per-group counts perturbed by
    * Laplace(Δ/ε) noise, Δ = 1 because the groups are disjoint (one row
    * changes exactly one count). Noise comes from the inverse CDF —
    * `u ∈ (0,1)`, `noise = −(Δ/ε)·sign(u−0.5)·ln(1 − 2|u−0.5|)` — with
    * `u` drawn by [[graft.functions.TextFunctions.portableUniform]] over
    * `salt || groupKey`: a SEEDED portable PRNG, the [[DataSelection
    * .gumbelTopK]] contract. Re-running the release reproduces the same
    * noise (resumable pipelines; a privacy-accountant ledger can bind a
    * salt to a spent ε), and rotating the salt per release is the
    * deployment's entropy decision — the operator's contract is the
    * mechanism ARITHMETIC, which an oracle can replay exactly.
    *
    * Post-processing (rounding to 6 dp, clamping at 0) preserves DP.
    * Released columns: the group key and `n_noisy` ONLY — the exact
    * count must not ride along.
    *
    * Scale shape: one partial-agg count (group-table-sized after
    * map-side combine) + map-only noise over the group table. A 100 TB
    * histogram release costs one shuffle of the group-key bytes.
    */
  def laplaceNoisyCounts(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, salt: String = "dp1"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0.0 && epsilon.isFinite,
      s"epsilon must be positive, got $epsilon")
    val noise = laplaceNoise(seedKey(salt, groupCols), 1.0 / epsilon)
    df.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) :+
        greatest(lit(0.0), round(col("__n") + noise, 6)).as("n_noisy"): _*)
  }

  /** Seed-key encoding shared by every release: NULL-safe and
    * collision-free — a NULL group value encodes as the bare token `n`
    * (a raw NULL would NULL the whole key and the clamp would then
    * release a noiseless constant), and non-null values ride a LENGTH
    * PREFIX (`<len>:<value>`), so a delimiter inside a value can never
    * make two distinct groups share a seed and thus a noise draw.
    */
  private def seedKey(salt: String, groupCols: Seq[String]): Column =
    concat((lit(salt) +: groupCols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(lit("|"),
        coalesce(concat(length(s).cast("string"), lit(":"), s), lit("n")))
    }).toIndexedSeq: _*)

  /** Laplace(scale) draw from the seeded portable uniform over `key` —
    * inverse CDF, replayable (the q160 mechanism arithmetic).
    */
  private def laplaceNoise(key: Column, scale: Double): Column = {
    val centered = graft.functions.TextFunctions.portableUniform(key) - lit(0.5)
    (when(centered >= 0, lit(-scale)).otherwise(lit(scale))) *
      log(lit(1.0) - lit(2.0) * abs(centered))
  }

  /** Differentially-private MEAN release: values CLAMPED to `[lo, hi]`
    * (the clamp bounds the sensitivity — the caller's domain knowledge,
    * not data-derived), then the standard two-query composition: a
    * noisy SUM (Laplace, sensitivity `max(|lo|, |hi|)`, ε/2) over a
    * noisy COUNT (sensitivity 1, ε/2), denominator floored at 1. Both
    * draws come from the seeded portable uniform with DISTINCT role
    * suffixes on the group key, so re-running the release reproduces
    * it and the two draws can never coincide by key collision.
    *
    * Exactness: the clamped sum rides the repo's order-independent
    * discipline — per-row clamp rounded 6 dp, summed as DECIMAL — so
    * the oracle replays the release bit-for-bit. Post-processing
    * (rounding, the max(1, ·) floor) preserves DP. Released columns:
    * group key, `n_noisy`, `mean_noisy` ONLY.
    *
    * Scale shape: one partial-agg shuffle (two scalar accumulators per
    * group) + map-only noise over the group table.
    */
  def laplaceNoisyMean(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, epsilon: Double,
      salt: String = "dp1"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(hi > lo && lo.isFinite && hi.isFinite,
      s"need a finite clamp range, got [$lo, $hi]")
    require(epsilon > 0.0 && epsilon.isFinite,
      s"epsilon must be positive, got $epsilon")
    val sumScale = math.max(math.abs(lo), math.abs(hi)) / (epsilon / 2.0)
    val cntScale = 1.0 / (epsilon / 2.0)
    val clamped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val sumNoise = laplaceNoise(concat(seedKey(salt, groupCols), lit("|sum")), sumScale)
    val cntNoise = laplaceNoise(concat(seedKey(salt, groupCols), lit("|cnt")), cntScale)
    df.where(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(sum(round(clamped, 6).cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("__s"),
        count(lit(1)).as("__n"))
      .select(groupCols.map(col) :+
        greatest(lit(0.0), round(col("__n") + cntNoise, 6)).as("n_noisy") :+
        round((col("__s").cast("double") + sumNoise) /
          greatest(lit(1.0), col("__n") + cntNoise), 6).as("mean_noisy"): _*)
  }

  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.forall(df.columns.contains),
      s"quasi columns ${quasiCols.filterNot(df.columns.contains)} not in ${df.columns.toSeq}")
    // null-SAFE join: a NULL quasi combination is a group like any other
    // (GROUP BY collates NULLs), so the probe must match it too — a bare
    // equi-join would silently leave small NULL-combination groups exposed
    val risky = kAnonymityAudit(df, quasiCols, k)
      .where(col("at_risk"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")).toIndexedSeq: _*)
      .withColumn("__risky", lit(true))
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    val joined = df.join(broadcast(risky), cond, "left")
    val out = quasiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c,
        when(col("__risky"), lit(null).cast(df.schema(c).dataType))
          .otherwise(col(c)))
    }
    out.withColumn("suppressed", coalesce(col("__risky"), lit(false)))
      .drop("__risky")
      .drop(quasiCols.map(c => s"__q_$c").toIndexedSeq: _*)
  }
}
