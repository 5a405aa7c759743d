package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: reduce an ordered changelog (insert / update /
  * delete events per key) to the final table state. The batch analog of the
  * reference's per-run MERGE (`queries.py:35-48`) when the input is a
  * CHANGE STREAM rather than a staging snapshot — the shape every
  * warehouse-ingest pipeline needs once sources emit Debezium-style
  * changelogs instead of full extracts.
  *
  * Scale design: final state per key is `max_by(struct(all columns), seq)`
  * — ONE partial-aggregatable shuffle on the key, never a window sort over
  * the changelog (a per-key `row_number` would sort 100 TB of changes;
  * max_by folds map-side to one candidate row per key per task). Delete
  * wins by being the last op: the filter happens AFTER the fold, so a
  * delete followed by nothing stays deleted at zero extra cost.
  */
object Cdc {

  /** Final state of a changelog. `seqCol` must be unique per key (a
    * change-stream LSN/offset — ties would make "latest" ambiguous; the
    * guard is the caller's, mirroring Scd2's batch contract). Rows whose
    * LAST op is `deleteOp` are absent from the output.
    */
  def applyChangelog(
      changes: DataFrame, key: String, seqCol: String, opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val attrs = changes.columns.filterNot(c => c == key || c == seqCol || c == opCol).toSeq
    require(attrs.nonEmpty, "changelog must carry at least one attribute column")
    changes.groupBy(col(key))
      .agg(max_by(struct((opCol +: attrs).map(col): _*), col(seqCol)).as("__last"))
      .where(col(s"__last.$opCol") =!= deleteOp)
      .select(col(key) +: attrs.map(a => col(s"__last.$a").as(a)): _*)
  }
}
