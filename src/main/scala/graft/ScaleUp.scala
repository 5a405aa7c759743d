package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from the driver-provided sf0.1
  * parquet, for SCALE-TREND evidence only (BENCH_sf1.json): correctness
  * stays pinned to the driver's own tables (TESTDATA.md), but linearity
  * claims need a second, bigger point on the curve.
  *
  * Method: union `factor` key-shifted copies of every fact table. Key
  * columns shift by `copy * (max_key + 1)` so each copy joins ONLY its
  * own copy (FK relationships and join fan-outs are preserved, selectivity
  * per key is unchanged — the same economics, `factor`× the rows).
  * Fixed-size dims (region, nation) stay as-is, matching how TPC-H scales.
  * Text/embedding payloads get a per-copy deterministic perturbation (a
  * copy tag token / a tiny per-copy rotation) so dedup-family queries see
  * `factor`× the corpus, not `factor`-way exact-duplicate mass that no
  * real corpus at scale would ship through to the near-dup stage.
  *
  * Usage: `runMain graft.ScaleUp <srcSfDir> <destDir> [factor]`.
  */
object ScaleUp {

  /** Union `factor` copies with the listed key columns shifted per copy;
    * `perturb` optionally rewrites payload columns given the copy index.
    */
  private def scaled(
      df: DataFrame, keyCols: Seq[String], factor: Int,
      perturb: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
    val offsets: Map[String, Long] = keyCols.map { k =>
      k -> (df.agg(max(col(k))).head().getLong(0) + 1L)
    }.toMap
    (0 until factor).map { i =>
      val shifted = keyCols.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(i.toLong * offsets(k)))
      }
      perturb(shifted, i)
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local(Sessions.envCpus, "graft-scaleup")
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dest/$t.parquet")

    // fixed dims: size-invariant across SFs (TPC-H's own rule)
    Seq("region", "nation").foreach(t => save(t, load(t)))

    save("customer", scaled(load("customer"), Seq("c_custkey"), factor))
    save("supplier", scaled(load("supplier"), Seq("s_suppkey"), factor))
    save("part", scaled(load("part"), Seq("p_partkey"), factor))
    save("orders", scaled(load("orders"), Seq("o_orderkey", "o_custkey"), factor))
    save("lineitem", scaled(load("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), factor))
    save("events", scaled(load("events"), Seq("event_id", "user_id"), factor))
    save("documents", scaled(load("documents"), Seq("doc_id"), factor,
      perturb = (d, i) =>
        if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" copytag$i")))))
    save("embeddings", scaled(load("embeddings"), Seq("vec_id"), factor,
      perturb = (d, i) =>
        if (i == 0) d
        else d.withColumn("embedding",
          // tiny deterministic per-copy jitter: same magnitude ranking,
          // distinct vectors — near-dup stages see factor x corpus, not
          // factor-way exact clones
          transform(col("embedding"), (v, j) =>
            (v + sin(col("vec_id") * lit(i) + j) * lit(0.01f)).cast("float")))))
    spark.stop()
  }
}
