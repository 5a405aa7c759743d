package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to interval rows with
  * `start <= point < end`, plus optional equi-keys.
  *
  * A naive inequality join plans as BroadcastNestedLoop — O(|L|·|R|) and
  * a cluster-killer at scale. This operator bucketizes time: each interval
  * is exploded to the fixed-width buckets it overlaps, each point maps to
  * exactly one bucket, and the join becomes an EQUI-join on (keys, bucket)
  * followed by the exact range predicate as a post-filter. Work scales with
  * |L| + Σ interval-widths/bucket instead of the cross product; bucket
  * width trades replication factor against candidate precision.
  */
object RangeJoin {

  /** @param bucketWidthMicros bucket width; pick ~ the median interval
    *                          width so intervals explode to O(1) buckets
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKeys: Seq[String],
      intervalKeys: Seq[String],
      pointTime: String,
      intervalStart: String,
      intervalEnd: String,
      bucketWidthMicros: Long): DataFrame = {
    require(pointKeys.length == intervalKeys.length)
    val pBucket = floor(unix_micros(col(pointTime).cast("timestamp")) / bucketWidthMicros)
    val p = points.withColumn("__bucket", pBucket)
    val sB = floor(unix_micros(col(intervalStart).cast("timestamp")) / bucketWidthMicros)
    val eB = floor(unix_micros(col(intervalEnd).cast("timestamp")) / bucketWidthMicros)
    val i = intervals.withColumn("__bucket", explode(sequence(sB, eB)))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => p(pk) === i(ik) }
      .foldLeft(p("__bucket") === i("__bucket"))(_ && _)
    p.join(i, keyCond)
      .where(col(pointTime).cast("timestamp") >= col(intervalStart).cast("timestamp") &&
        col(pointTime).cast("timestamp") < col(intervalEnd).cast("timestamp"))
      .drop("__bucket")
  }
}
