package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{MinHashDedup, Parallelism, Tables}
import graft.functions.TextFunctions

/** Stage-by-stage timing of the q13d exact-Jaccard pair pipeline (mirrors
  * MinHashDedup.jaccardPairs' current shape).
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.5
    val spark = Sessions.local(Sessions.envCpus, "profile-jaccard")
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Parallelism.ensureCompute(docs).select(col("doc_id").as("id"),
      TextFunctions.hashedShingles(col("text"), 3).as("shingles"))
      .persist()
    timed("shingles")(base.count())
    val exploded = base.select(col("id"), size(col("shingles")).as("len"),
      explode(col("shingles")).as("s"))
    val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    timed("freq")(freq.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    val alpha = 2 * threshold / (1 + threshold)
    val ranked = exploded.join(freq, Seq("s"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("len") - ceil(lit(threshold) * col("len")).cast("int") + 1)
      .persist()
    timed("ranked(probe prefix)")(println(s"[profile] probeRows=${ranked.count()}"))
    val index = ranked
      .where(col("rk") <= col("len") - ceil(lit(alpha) * col("len")).cast("int") + 1)
      .select(col("s"), col("id").as("idI"), col("len").as("lenI"))
    timed("index prefix")(println(s"[profile] indexRows=${index.count()}"))
    val probe = ranked.select(col("s"), col("id").as("idP"), col("len").as("lenP"))
    val cands = index.join(probe, Seq("s"))
      .where((col("lenI") < col("lenP") ||
          (col("lenI") === col("lenP") && col("idI") < col("idP"))) &&
        col("lenI").cast("double") >= lit(threshold) * col("lenP"))
      .select(least(col("idI"), col("idP")).as("idA"),
        greatest(col("idI"), col("idP")).as("idB"))
      .distinct()
      .persist()
    timed("candidates")(println(s"[profile] candidates=${cands.count()}"))
    val shA = base.select(col("id").as("idA"), col("shingles").as("shA"))
      .join(broadcast(cands), Seq("idA"))
    val shB = base.select(col("id").as("idB"), col("shingles").as("shB"))
      .join(broadcast(cands), Seq("idB"))
    val verified = shA.join(shB.hint("shuffle_hash"), Seq("idA", "idB"))
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .where(col("jaccard") >= threshold)
    timed("verify")(println(s"[profile] verified=${verified.count()}"))
    timed("end-to-end jaccardPairs")(
      println(s"[profile] pairs=${MinHashDedup.jaccardPairs(docs, "doc_id", "text", 0.5).count()}"))
    spark.stop()
  }
}
