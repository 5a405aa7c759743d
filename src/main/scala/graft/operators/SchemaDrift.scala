package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift detection and evolution (§1.3 of SURVEY.md).
  *
  * Reference behavior (`/root/reference/utilities/etl.py:191-277`):
  *  - added columns in the incoming batch -> `ALTER TABLE ADD COLUMN` on the
  *    destination (`etl.py:246-259,285-290`): old rows read NULL.
  *  - type-changed columns -> a NEW suffixed sidecar column
  *    `{name}_{type}` is added and the incoming data lands there
  *    (`etl.py:263-276`); the original column is preserved. (The reference
  *    returns after the first type change, `etl.py:277` — a bug; we handle
  *    all drifted columns, reproducing the intent.)
  *
  * Here schemas are first-class `StructType`s; "ALTER TABLE" becomes pure
  * plan surgery (add NULL-literal columns), which is free at any scale —
  * no data rewrite, exactly like a metadata-only DDL on a real warehouse.
  */
object SchemaDrift {

  /** One drifted column: present in incoming with a different type than dest. */
  final case class TypeChange(name: String, destType: DataType, incomingType: DataType) {
    /** Sidecar name, mirroring the reference's `{col}_{type}` (`etl.py:263-267`). */
    def sidecarName: String = s"${name}_${incomingType.simpleString}"
  }

  final case class DriftReport(
      addedColumns: Seq[StructField],   // in incoming, absent from dest
      missingColumns: Seq[StructField], // in dest, absent from incoming
      typeChanges: Seq[TypeChange]) {
    def isDrifted: Boolean =
      addedColumns.nonEmpty || missingColumns.nonEmpty || typeChanges.nonEmpty
  }

  /** Diff two schemas by column name (mirrors the information_schema diff at
    * `etl.py:200-236`). Name comparison is case-sensitive, like Spark's
    * default resolver for parquet.
    */
  def diff(dest: StructType, incoming: StructType): DriftReport = {
    val destByName = dest.fields.map(f => f.name -> f).toMap
    val incByName = incoming.fields.map(f => f.name -> f).toMap
    val added = incoming.fields.filterNot(f => destByName.contains(f.name)).toSeq
    val missing = dest.fields.filterNot(f => incByName.contains(f.name)).toSeq
    val changed = incoming.fields.toSeq.flatMap { f =>
      destByName.get(f.name) match {
        case Some(df) if df.dataType != f.dataType =>
          Some(TypeChange(f.name, df.dataType, f.dataType))
        case _ => None
      }
    }
    DriftReport(added, missing, changed)
  }

  /** The evolved (union) schema both sides are aligned to:
    * dest columns first (original order), then for each type change the
    * sidecar column, then incoming-only columns in incoming order.
    */
  def evolvedSchema(dest: StructType, incoming: StructType): StructType = {
    val report = diff(dest, incoming)
    val sidecars = report.typeChanges.map(tc =>
      StructField(tc.sidecarName, tc.incomingType, nullable = true))
    val added = report.addedColumns.map(_.copy(nullable = true))
    StructType(dest.fields.map(_.copy(nullable = true)) ++ sidecars ++ added)
  }

  /** Project `df` onto `target` schema: existing columns pass through,
    * absent columns become typed NULL literals. `renames` maps df column ->
    * target column (the type-change sidecar redirect, `etl.py:269-276`).
    */
  private def conform(df: DataFrame, target: StructType, renames: Map[String, String]): DataFrame = {
    val inverse = renames.map(_.swap) // target name -> df name
    val have = df.columns.toSet
    df.select(target.fields.toIndexedSeq.map { f =>
      inverse.get(f.name) match {
        case Some(src) if have.contains(src) => col(src).as(f.name)
        case _ if have.contains(f.name) && !renames.contains(f.name) => col(f.name)
        case _ => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Align `dest` and `incoming` to the evolved schema.
    * dest: gains NULL sidecars + NULL added columns.
    * incoming: its type-drifted columns are RENAMED to the sidecar (so the
    * original-typed column reads NULL for incoming rows), absent dest
    * columns read NULL.
    */
  def align(dest: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val target = evolvedSchema(dest.schema, incoming.schema)
    val report = diff(dest.schema, incoming.schema)
    val renames = report.typeChanges.map(tc => tc.name -> tc.sidecarName).toMap
    (conform(dest, target, Map.empty), conform(incoming, target, renames))
  }

  /** Drift-aware union: evolve then union the aligned frames. This is the
    * row-level generalization of the reference's ALTER+load sequence — a
    * narrow (no-shuffle) operation at any scale.
    */
  def driftUnion(dest: DataFrame, incoming: DataFrame): DataFrame = {
    val (d, i) = align(dest, incoming)
    d.unionByName(i)
  }
}
