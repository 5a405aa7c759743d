package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

/** Incremental aggregate maintenance: keep a per-group (count, sum)
  * materialized view current under an I/U/D changelog WITHOUT rescanning
  * the base table — the delta-maintenance half of every warehouse
  * materialized view, and the reason a 100 TB fact table's dashboards
  * can refresh from a day's changes instead of a full recompute.
  * Composes with [[Cdc]]: Cdc replays a changelog into row state; this
  * folds the same changelog shape directly into aggregate state.
  *
  * Scale design: the view state is GROUP-sized, the delta batch is
  * CHANGE-sized; one union + one partial-aggregatable shuffle on the
  * group key per refresh — the base table is never touched. Updates may
  * move rows between groups (canonicalized internally as delete-before +
  * insert-after, so a group move debits one group and credits the other).
  *
  * Correctness constraint: the summed column must be DECIMAL or integral.
  * Double addition is not associative, so an incrementally-maintained
  * double sum would drift from a recompute by summation order; decimal
  * sums are exact, which is what lets the oracle assert
  * incremental == full-recompute bit-for-bit (q91).
  */
object IncrementalAgg {

  private def requireExact(df: DataFrame, valueCol: String): Unit = {
    val dt = df.schema(valueCol).dataType
    require(dt.isInstanceOf[DecimalType] || dt == LongType || dt == IntegerType,
      s"value column '$valueCol' is $dt — incremental sums need an exact " +
        "type (DECIMAL or integer); cast doubles to DECIMAL first")
  }

  /** Initial view state from the base table: (group, n, total). */
  def build(base: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    requireExact(base, valueCol)
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
  }

  /** Fold one change batch into the state. `changes` columns:
    *  - `op`: 'I' (insert: group/value set), 'D' (delete: old_group/
    *    old_value set), 'U' (update: both images set — group may differ);
    *  - `group`, `value`: the after-image (I, U);
    *  - `old_group`, `old_value`: the before-image (D, U).
    * Groups whose count reaches zero leave the state.
    */
  def applyChanges(
      state: DataFrame, changes: DataFrame, groupCol: String): DataFrame = {
    val credit = changes.where(col("op").isin("I", "U"))
      .select(col("group").as("__g"), lit(1L).as("__dn"), col("value").as("__dv"))
    val debit = changes.where(col("op").isin("D", "U"))
      .select(col("old_group").as("__g"), lit(-1L).as("__dn"),
        (col("old_value") * lit(-1)).as("__dv"))
    state.select(col(groupCol).as("__g"), col("n").as("__dn"), col("total").as("__dv"))
      .unionByName(credit)
      .unionByName(debit)
      .groupBy(col("__g"))
      .agg(sum(col("__dn")).as("n"), sum(col("__dv")).as("total"))
      .where(col("n") > 0)
      .select(col("__g").as(groupCol), col("n"), col("total"))
  }
}
