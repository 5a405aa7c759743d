package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k (KMV) sketch: the k DISTINCT values with the smallest md5
  * hash — a deterministic, merge-able, order-insensitive group sample.
  *
  * Why this shape for a 100 TB training pipeline:
  *  - deterministic sample: the same corpus always yields the same k rows
  *    per group, independent of partitioning, task order, or cluster size —
  *    unlike `rand()`-based sampling, re-runs and audits reproduce exactly;
  *  - partial-aggregatable: each map task keeps at most k entries, merges
  *    are k-way min-unions — a group's state never exceeds O(k) no matter
  *    how many rows feed it (`collect_list`+sort would buffer the group);
  *  - a KMV sketch: the k-th smallest hash estimates distinct counts, and
  *    two groups' sketches estimate Jaccard overlap, for free.
  *
  * Hashing is md5 over the string's UTF-8 bytes, so an external system
  * (the DuckDB oracle: `row_number() OVER (ORDER BY md5(v))`) reproduces
  * the exact sample — the sketch is portable, not engine-private.
  *
  * Buffer is an immutable TreeMap(hashHex -> value), trimmed to k on every
  * insert: update/merge are O(log k), eval emits values ascending by hash.
  */
case class BottomKSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeMap[String, UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, "bottom_k requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  private def md5hex(v: UTF8String): String = {
    val d = MessageDigest.getInstance("MD5").digest(v.getBytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def createAggregationBuffer(): TreeMap[String, UTF8String] = TreeMap.empty

  private def insert(
      buf: TreeMap[String, UTF8String], hex: String, v: UTF8String): TreeMap[String, UTF8String] =
    if (buf.contains(hex)) buf
    else if (buf.size < k) buf.updated(hex, v)
    else if (hex < buf.lastKey) buf.updated(hex, v) - buf.lastKey
    else buf

  override def update(
      buf: TreeMap[String, UTF8String], input: InternalRow): TreeMap[String, UTF8String] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = v.asInstanceOf[UTF8String]
      val hex = md5hex(s)
      // clone: the evaluated UTF8String may point into a reused row buffer
      if (buf.contains(hex)) buf else insert(buf, hex, s.clone())
    }
  }

  override def merge(
      b1: TreeMap[String, UTF8String], b2: TreeMap[String, UTF8String]): TreeMap[String, UTF8String] =
    b2.foldLeft(b1) { case (acc, (hex, v)) => insert(acc, hex, v) }

  override def eval(buf: TreeMap[String, UTF8String]): Any =
    new GenericArrayData(buf.values.toArray[Any])

  override def serialize(buf: TreeMap[String, UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.values.foreach { v =>
      val b = v.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TreeMap[String, UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    var buf = TreeMap.empty[String, UTF8String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      val v = UTF8String.fromBytes(b)
      buf = buf.updated(md5hex(v), v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKSketch =
    copy(child = newChild)
}

object SketchAggregates {
  /** Column surface: `bottom_k(col, k)` aggregate. */
  def bottom_k(c: Column, k: Int): Column =
    ColumnBridge.column(BottomKSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
