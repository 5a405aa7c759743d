package graft.tools

import graft.Sessions
import graft.operators.{MinHashDedup, Tables}

/** End-to-end timing of the q13b dedup path, stage by stage. */
object ProfileQ13b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCpus, "profile-q13b")
    val docs = Tables.load(spark, sfDir, "documents")
    val cfg = MinHashDedup.Config(jaccardThreshold = 0.5)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = timed("verifiedPairs")(
      MinHashDedup.verifiedPairs(docs, "doc_id", "text", cfg))
    val groups = timed("duplicateGroups")(MinHashDedup.duplicateGroups(pairs))
    timed("groups.count")(println(s"[profile] groups=${groups.count()}"))
    val kept = MinHashDedup.dedup(docs, "doc_id", "text", cfg)
    timed("dedup full (noop write)")(
      kept.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
