package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audit-column stamping (P1).
  *
  * Reference: `df["record_loaded_at"] = datetime.now(timezone.utc)` on every
  * load path (`/root/reference/utilities/etl.py:32,95`). The audit column is
  * excluded from merge change detection (`etl.py:160-162`), which
  * [[Merge.AuditCols]] mirrors.
  */
object Audit {
  val ColumnName = "record_loaded_at"

  /** Stamp with the session clock (UTC per session timeZone). */
  def stamp(df: DataFrame): DataFrame =
    df.withColumn(ColumnName, current_timestamp())

  /** Stamp with an explicit timestamp — used by tests/oracles where the
    * wall clock would be non-deterministic.
    */
  def stampAt(df: DataFrame, ts: Column): DataFrame =
    df.withColumn(ColumnName, ts.cast("timestamp"))
}
