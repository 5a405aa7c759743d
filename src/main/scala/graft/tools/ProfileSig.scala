package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{Parallelism, Tables}
import graft.functions.TextFunctions

/** Head-to-head of minhash signature shapes over pre-hashed shingles:
  * (a) explode + repartition + 64-min hash agg + join-back (current);
  * (b) row-local HOF projection (64 array_min(transform(...)) per row).
  */
object ProfileSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCpus, "profile-sig")
    val docs = Tables.load(spark, sfDir, "documents")
    val M = (1L << 31) - 1
    val rnd = new scala.util.Random(42L)
    val as = Seq.fill(64)((math.abs(rnd.nextLong()) % (M - 1)) + 1)
    val bs = Seq.fill(64)(math.abs(rnd.nextLong()) % M)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Parallelism.ensureCompute(docs).select(col("doc_id").as("id"),
      TextFunctions.hashedShingles(col("text"), 3).as("shingles"))
      .persist()
    timed("shingles(cache)")(base.count())

    // (a) current shape
    def viaAgg(): Long = {
      val hashed = base
        .select(col("id"), explode(col("shingles")).as("s"))
        .select(col("id"), pmod(col("s"), lit(M)).as("h"))
        .repartition(col("id"))
      val projected = hashed.select(
        col("id") +: as.zip(bs).zipWithIndex.map { case ((a, b), i) =>
          pmod(lit(a) * col("h") + lit(b), lit(M)).as(s"__v$i")
        }: _*)
      val minCols = (0 until 64).map(i => min(col(s"__v$i")).as(s"__m$i"))
      projected.groupBy(col("id"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("id"),
          array((0 until 64).map(i => col(s"__m$i")): _*).as("sig"))
        .count()
    }
    // (b) row-local HOF
    def viaHof(): Long = {
      val hm = transform(col("shingles"), h => pmod(h, lit(M)))
      val sig = array(as.zip(bs).map { case (a, b) =>
        array_min(transform(col("__hm"), x => pmod(lit(a) * x + lit(b), lit(M))))
      }: _*)
      base.select(col("id"), hm.as("__hm"))
        .select(col("id"),
          when(size(col("__hm")) === 0, array().cast("array<bigint>"))
            .otherwise(sig).as("sig"))
        .count()
    }
    timed("agg shape (cold)")(viaAgg())
    timed("agg shape (warm)")(viaAgg())
    timed("hof shape (cold)")(viaHof())
    timed("hof shape (warm)")(viaHof())
    spark.stop()
  }
}
