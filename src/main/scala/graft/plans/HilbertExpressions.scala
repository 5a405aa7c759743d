package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hilbert-curve index for multi-dimensional data layout.
  *
  * The Hilbert curve preserves locality strictly better than the Morton
  * z-curve ([[graft.operators.Layout.zValueN]]): consecutive curve
  * positions are ALWAYS adjacent cells (the z-curve jumps across the
  * space at every power-of-two seam), so files cut from a Hilbert-sorted
  * table cover tighter per-dimension boxes and min/max pruning skips
  * more files for the same box predicate — the reason lakehouse
  * OPTIMIZE implementations have been moving from z-order to Hilbert
  * as the default clustering curve. LayoutSpec measures the claim on
  * this repo's own pruning harness.
  *
  * [[HilbertOps.index]] is Skilling's transpose algorithm ("Programming
  * the Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard public
  * formulation): undo the per-level rotation/reflection, Gray-decode,
  * then interleave the transposed coordinates MSB-first. One flat loop
  * over bit levels; generated code reaches it through the static
  * forwarder like the repo's other native expressions.
  */
object HilbertOps {

  /** Hilbert distance of `coords` (each in `[0, 2^bits)`), 2..4 dims,
    * `k * bits <= 62` so the index stays positive in a signed Long.
    */
  def index(bits: Int, coords: Array[Long]): Long = {
    val n = coords.length
    require(n >= 2 && n <= 4, s"hilbert_index interleaves 2..4 dims, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"hilbert_index needs bits >= 1 and k*bits <= 62, got $n x $bits")
    val x = new Array[Long](n)
    System.arraycopy(coords, 0, x, 0, n)
    // axes -> transpose: inverse undo per level, then Gray encode
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> distance: one bit per dimension per level, MSB first
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((x(i) >>> j) & 1L)
        i += 1
      }
      j -= 1
    }
    h
  }

  /** ArrayData seam for the codegen'd expression. */
  def indexOf(bits: Int, coords: ArrayData): Long =
    index(bits, coords.toLongArray())
}

/** `hilbert_index(array(c0, c1[, c2[, c3]]), bits)` — codegen'd scalar
  * over long coordinates the caller already normalized to
  * `[0, 2^bits)` ([[graft.operators.Layout]]'s curve writers do). The
  * coordinate array rides Spark's own codegen'd `array(...)`; a null
  * array yields null (layout writers null-filter before keying).
  */
case class HilbertIndex(child: Expression, bitsPerDim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (bitsPerDim >= 1 && bitsPerDim <= 31) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits must be in [1, 31], got $bitsPerDim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> coordinates, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(input: Any): Any =
    HilbertOps.indexOf(bitsPerDim, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HilbertOps.indexOf($bitsPerDim, $c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The Morton (z-curve) companion: bit i of dimension d lands at
  * position `i·k + d`. Exists natively for the same reason as
  * [[HilbertOps]] — the HOF `aggregate(sequence(...))` formulation runs
  * an interpreted lambda per bit level per row (measured 5× slower on
  * the q164b layout rewrite); the semantics are identical.
  */
object MortonOps {
  def index(bits: Int, coords: Array[Long]): Long = {
    val n = coords.length
    require(n >= 2 && n <= 4, s"morton_index interleaves 2..4 dims, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"morton_index needs bits >= 1 and k*bits <= 62, got $n x $bits")
    var h = 0L
    var i = 0
    while (i < n) {
      val x = coords(i)
      var j = 0
      while (j < bits) {
        h |= ((x >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    h
  }

  def indexOf(bits: Int, coords: ArrayData): Long =
    index(bits, coords.toLongArray())
}

/** `morton_index(array(c0, c1[, c2[, c3]]), bits)` — the codegen'd
  * z-curve key; same contract as [[HilbertIndex]].
  */
case class MortonIndex(child: Expression, bitsPerDim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (bitsPerDim >= 1 && bitsPerDim <= 31) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits must be in [1, 31], got $bitsPerDim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> coordinates, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_index"

  override def nullSafeEval(input: Any): Any =
    MortonOps.indexOf(bitsPerDim, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MortonOps.indexOf($bitsPerDim, $c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HilbertExpressions {
  /** Column surface: Hilbert index of already-normalized long coords. */
  def hilbert(bitsPerDim: Int, coords: Column): Column =
    ColumnBridge.column(HilbertIndex(ColumnBridge.expression(coords), bitsPerDim))

  /** Column surface: Morton index of already-normalized long coords. */
  def morton(bitsPerDim: Int, coords: Column): Column =
    ColumnBridge.column(MortonIndex(ColumnBridge.expression(coords), bitsPerDim))
}
