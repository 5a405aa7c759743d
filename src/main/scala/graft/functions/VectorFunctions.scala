package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` / `array<double>`.
  *
  * Pure `functions._` expression trees (codegen'd): per-row sequential
  * accumulation in double, which keeps results deterministic and comparable
  * with a sequential oracle implementation.
  */
object VectorFunctions {

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def normL2(a: Column): Column =
    sqrt(aggregate(transform(toDouble(a), x => x * x), lit(0.0), _ + _))

  /** Cosine similarity in double; 0.0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val denom = normL2(a) * normL2(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Scalar int8 quantization: clip to [lo, hi], map linearly to 0..255.
    * All arithmetic in double (float inputs cast exactly), so any
    * IEEE-conformant engine produces the same codes — the DuckDB oracle
    * does. At 100 TB this is the 4x storage/IO lever for embedding
    * corpora: ANN candidate generation runs on codes, full precision only
    * re-scores the shortlist.
    */
  def quantize8(vec: Column, lo: Double, hi: Double): Column =
    transform(vec, v =>
      least(floor((greatest(least(v.cast("double"), lit(hi)), lit(lo)) - lit(lo))
        * lit(255.0) / lit(hi - lo)), lit(255.0)).cast("int"))

  /** Midpoint dequantization (code -> bucket center). Reconstruction error
    * is bounded by (hi-lo)/255/2 per element for in-range inputs.
    */
  def dequantize8(q: Column, lo: Double, hi: Double): Column =
    transform(q, x => lit(lo) + (x.cast("double") + lit(0.5)) * lit(hi - lo) / lit(255.0))

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `bits` sign
    * bits packed into a long. Hyperplane h_i is a deterministic pseudo-random
    * unit-free vector derived from (seed, i, dim) via a splitmix-style hash
    * — same constants as the scalar path in [[graft.operators.SimHashDedup]].
    */
  def hyperplaneSignature(v: Column, dim: Int, bits: Int, seed: Long): Column = {
    require(bits <= 63, "signature must fit a long")
    val planes: Seq[Seq[Double]] = LshPlanes.planes(dim, bits, seed)
    val bitCols = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce((x: Column, y: Column) => x.bitwiseOR(y))
  }
}

/** Deterministic pseudo-random hyperplanes (public splitmix64 recurrence). */
object LshPlanes {
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** `bits` planes of `dim` components in [-1, 1), reproducible from seed. */
  def planes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dim).map { d =>
        val h = splitmix64(seed ^ (b.toLong << 32) ^ d.toLong)
        (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
      }
    }
}
