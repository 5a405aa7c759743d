package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{MinHashDedup, Tables}

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCpus, "profile-minhash")
    val cfg = MinHashDedup.Config(jaccardThreshold = 0.5)
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = MinHashDedup.signatures(docs, "doc_id", "text", cfg)
      .persist()
    timed("signatures")(sigs.count())
    val cands = MinHashDedup.candidatePairs(sigs, cfg)
    val nCands = timed("candidatePairs")(cands.count())
    println(s"[profile] candidates=$nCands")
    val shA = sigs.select(col("id").as("idA"), col("shingles").as("shA"))
    val shB = sigs.select(col("id").as("idB"), col("shingles").as("shB"))
    val verified = cands.join(shA, "idA").join(shB, "idB")
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .where(col("jaccard") >= cfg.jaccardThreshold)
    val nVer = timed("verify")(verified.count())
    println(s"[profile] verified=$nVer")
    spark.stop()
  }
}
