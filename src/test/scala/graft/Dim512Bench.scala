package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** SCALE.md evidence: the dense rotation's per-row dim² contraction vs
  * the block-diagonal cap at a production-ish dim. Synthetic corpus,
  * deterministic; wall-clock printed per projection. Not shipped in the
  * bench surface — run by hand, numbers recorded in SCALE.md.
  */
object Dim512Bench {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 512
    val n = if (args.length > 1) args(1).toInt else 20000
    val nBlocks = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.local(8, "dim512")
    val bs = dim / nBlocks
    // deterministic rotation entries (not orthogonal — cost is the
    // same either way, only the multiply-add count matters here)
    val full = Array.tabulate(dim, dim)((i, j) =>
      BigDecimal(math.sin(i * 31 + j).abs / dim)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val blocks = Array.tabulate(nBlocks)(b =>
      Array.tabulate(bs, bs)((i, j) => full(b * bs + i)(b * bs + j)))
    val corpus = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        p => (col("id") * 131 + p).cast("double") / lit(dim * n))
        .as("vec")).localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DIM512 $label dim=$dim n=$rows blocks=$nBlocks ${sec}%.2f s")
    }
    // block first (smaller plan compiles faster; order doesn't matter
    // after the JVM warms on the checkpoint scan)
    time("warmup_scan") { corpus.agg(count(lit(1))).head().getLong(0) }
    time("block") {
      corpus.select(ProductQuantizer.rotatedBlocks(col("vec"), blocks)
        .as("r")).agg(count(col("r"))).head().getLong(0)
    }
    time("full") {
      corpus.select(ProductQuantizer.rotated(col("vec"), full)
        .as("r")).agg(count(col("r"))).head().getLong(0)
    }
    spark.stop()
  }
}
