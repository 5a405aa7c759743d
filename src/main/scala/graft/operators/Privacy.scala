package graft.operators

import org.apache.spark.sql.DataFrame
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
