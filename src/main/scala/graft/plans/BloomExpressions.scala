package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bit-test against a bitset carried as a REAL Spark broadcast variable —
  * the probe side of [[graft.operators.BloomJoin]] for bitsets too large
  * to ride the plan as a literal.
  *
  * A `typedLit(bits)` probe serializes the whole array into every task's
  * expression tree (at the 2²⁸-bit maximum that is a 32 MB literal PER
  * TASK); a broadcast variable ships the array to each executor ONCE via
  * the torrent broadcast path, and the expression closes over only the
  * (tiny) broadcast handle. Codegen caches `bc.value()` in a mutable
  * state field at operator init, so the per-row work is two shifts, a
  * mask and an array load — identical to the literal path's.
  *
  * Tier (b) of the custom-operator ladder (native scalar Expression, cf.
  * [[CosineSimilarity]]): the surrounding join/filter stays declarative.
  */
case class BroadcastBitTest(child: Expression, bits: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint bit position, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "broadcast_bit_test"

  override def nullSafeEval(pos: Any): Any = {
    val p = pos.asInstanceOf[Long]
    (bits.value((p >>> 6).toInt) & (1L << (p & 63L).toInt)) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bits,
      classOf[Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "bloomBits",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, pos =>
      s"${ev.value} = ($arr[(int)($pos >>> 6)] & (1L << (int)($pos & 63L))) != 0L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column surface: true iff `pos`'s bit is set in the broadcast bitset. */
  def bitTest(pos: Column, bits: Broadcast[Array[Long]]): Column =
    ColumnBridge.column(BroadcastBitTest(ColumnBridge.expression(pos), bits))
}
