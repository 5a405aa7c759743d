package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{MinHashDedup, Parallelism, Tables}
import graft.functions.TextFunctions

/** Stage-by-stage timing of the q13f portable minhash pipeline (mirrors
  * MinHashDedup.portableVerifiedPairs' current shape) — run to see which
  * stage dominates before optimizing.
  */
object ProfilePortableMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCpus, "profile-portable-minhash")
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stage 1: token hashes only
    val th = Parallelism.ensureCompute(docs).select(col("doc_id").as("id"),
      TextFunctions.portableTokenHashes(col("text")).as("ths")).persist()
    timed("tokenHashes")(th.count())
    // stage 2: shingle folds on top
    val base = Parallelism.ensureCompute(docs).select(col("doc_id").as("id"),
      TextFunctions.portableShingleHashes(
        TextFunctions.portableTokenHashes(col("text")), 3).as("shingles")).persist()
    timed("shingleHashes(incl tokens)")(base.count())
    th.unpersist()
    // stage 3: full pipeline end-to-end
    timed("portableVerifiedPairs e2e")(
      println(s"[profile] pairs=${MinHashDedup.portableVerifiedPairs(
        docs, "doc_id", "text", 0.5).count()}"))
    spark.stop()
  }
}
