package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT-DEFINED CHUNKING (the LBFS/Gear rolling-hash family —
  * Muthitacharoen et al. 2001; Xia et al.'s FastCDC lineage): cut a
  * stream where a rolling hash of the last w symbols hits
  * `h % modulus == 0`, so chunk boundaries are a pure function of LOCAL
  * CONTENT — an insertion early in a document moves every byte offset
  * but only the chunks it touches change, which is what makes
  * chunk-level dedup survive edits where whole-blob hashing cannot.
  *
  * Determinism contract (the repo's portable-fold discipline): the
  * gear value of a code point is `((cp + 1) · 2654435761) mod 2^48`,
  * the rolling hash is `h ← (2h + g) mod 2^48` (mod 2^48 makes symbols
  * older than 48 positions fall out of the window EXACTLY — the shift
  * pushes them past the modulus), and each chunk's identity is the
  * standard 48-bit polynomial fold of its code points packed with its
  * length (`poly + min(len, 16383) · 2^48`, sign-safe — the length
  * SATURATES at the 14-bit pack budget rather than wrapping, so a
  * pathological over-long chunk under-reports its reclaimable bytes by
  * a bounded amount instead of reading ~0; the oracle mirrors it as
  * `least(len, 16383)`). Every number is integer arithmetic a DuckDB
  * oracle replays; no min-size clamp, so boundaries are
  * position-independent predicates (the clamped variant is sequential
  * and would break SQL replay). `modulus` is capped at 2^12: expected
  * chunk length ≈ modulus, so the cap keeps saturation astronomically
  * rare (P ≈ e^{-16384/modulus} ≤ e^{-4} only past it).
  */
object CdcOps {
  private final val M = 281474976710656L // 2^48

  /** Packed (chunkPolyHash, chunkLen) list for `s` under `modulus`
    * (expected chunk length ≈ modulus symbols). Empty input → empty.
    */
  def chunkHashes(s: UTF8String, modulus: Long): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0L
    var chunkHash = 0L
    var chunkLen = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      chunkHash = (chunkHash * 131L + cp) % M
      chunkLen += 1L
      h = (h * 2L + ((cp + 1L) * 2654435761L) % M) % M
      if (h % modulus == 0L) {
        out += chunkHash + math.min(chunkLen, 16383L) * M
        chunkHash = 0L
        chunkLen = 0L
      }
      i += Character.charCount(cp)
    }
    if (chunkLen > 0L) out += chunkHash + math.min(chunkLen, 16383L) * M
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text, modulus)` — codegen'd packed chunk list. */
case class CdcChunks(child: Expression, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.simpleString}")
    else if (modulus < 2 || modulus > (1L << 12))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName modulus must be in [2, 2^12], got $modulus — expected " +
          "chunk length tracks modulus and the packed length budget is 14 bits")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcOps.chunkHashes(input.asInstanceOf[UTF8String], modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcOps.chunkHashes($c, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcExpressions {
  /** Column surface: packed (hash, len) chunk list of a text column. */
  def cdcChunks(text: Column, modulus: Long): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), modulus))
}
