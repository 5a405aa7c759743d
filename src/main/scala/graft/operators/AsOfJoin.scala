package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the columns of the
  * LATEST right row with the same key and `rightTime <= leftTime`.
  *
  * The canonical training-data join (features as of the example's event
  * time — no leakage from the future) and an operator Spark lacks.
  * Implemented at tier (a) of the custom-operator ladder — composition:
  * tag and union both sides, then one window pass per key ordered by
  * (time, side) carries the last-seen right image forward. ONE shuffle of
  * left+right, no range explosion, no per-key collect — survives arbitrary
  * key cardinality; a skewed hot key can be salted upstream.
  *
  * Right rows must be unique per (keys, rightTime) — pre-dedup with
  * [[Dedup.byKeyLatest]] — otherwise "the" latest row is ambiguous (DuckDB
  * ASOF leaves ties undefined too).
  *
  * Equality included: a right row AT the left timestamp is visible (sorts
  * before the left row via the side tag).
  */
object AsOfJoin {

  /** @param rightCols right-column -> output-column name map (output names
    *                  must not collide with left columns)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String]): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
    val rcPairs = rightCols.toSeq // fixed iteration order throughout
    val outNames = rcPairs.map(_._2)
    require(outNames.intersect(left.columns.toSeq).isEmpty,
      s"output names $outNames collide with left columns")

    val leftPayload = left.columns.toSeq
    val rightTyped = right.schema.fields.map(f => f.name -> f.dataType).toMap
    // The right image travels as ONE struct so the window's last() carries a
    // whole right row: filling each output column independently would mix
    // fields of different right rows whenever the latest row holds a NULL
    // (its NULL would be "filled" from an older row).
    val imageType = org.apache.spark.sql.types.StructType(
      rcPairs.map { case (rc, out) =>
        org.apache.spark.sql.types.StructField(out, rightTyped(rc), nullable = true)
      })

    // left rows: payload + null right-image, side tag 1
    val lSide = left.select(
      (leftKeys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") } :+
        col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(imageType).as("__img"): _*)
    // right rows: null payload, right-image struct, side tag 0 (sorts first
    // on ties)
    val rSide = right.select(
      (rightKeys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") } :+
        col(rightTime).cast("timestamp").as("__t") :+ lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rcPairs.map { case (rc, out) => col(rc).as(out) }: _*).as("__img"): _*)

    val keyCols = leftKeys.indices.map(i => col(s"__k$i"))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .select((col("__side") +: leftPayload.map(col)) :+
        last(col("__img"), ignoreNulls = true).over(w).as("__img"): _*)
    filled.where(col("__side") === 1)
      .select(leftPayload.map(col) ++
        outNames.map(o => col(s"__img.`$o`").as(o)): _*)
  }
}
