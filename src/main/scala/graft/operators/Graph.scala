package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics over edge lists — PageRank as the
  * canonical representative (the same join-agg-iterate shape serves label
  * propagation, which [[MinHashDedup.connectedComponents]] already uses
  * for dup groups). No reference analog; belongs to the analytics mandate
  * (link-quality scoring of a crawled corpus is a standard LLM-pipeline
  * curation signal).
  *
  * Scale design: one iteration = one equi-join (edges ⋈ ranks on src — the
  * edge table's partitioning is reusable across every iteration) + one
  * partial-aggregatable sum by dst. Ranks are node-sized, edges
  * edge-sized; nothing driver-side except the node COUNT (one long). A
  * fixed iteration budget keeps the whole computation ONE lazy plan —
  * Catalyst sees all iterations at once; at a 100 TB edge scale you'd
  * checkpoint ranks every few iterations to cap lineage, which is the
  * [[Sinks.handoff]] seam.
  */
object Graph {

  /** PageRank with a fixed iteration count (simplified formulation, no
    * dangling-mass redistribution: rank = (1-d)/n + d * Σ in-contribs —
    * the textbook per-node update, deterministic given the edge list).
    * `edges` must be (src, dst) pairs, self-loop-free and distinct —
    * multi-edges would double-count contributions. Output: node,
    * rank (rounded to 6 dp: summation order differs across engines).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20] (lineage grows per iteration)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // the one driver-side scalar: |V| for the teleport term
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val eDeg = e.join(deg, Seq("src"))
    var r = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = eDeg.join(r, eDeg("src") === r("node"))
        .select(col("dst").as("node"), (col("r") / col("__d")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      r = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("r"))
    }
    r.select(col("node"), round(col("r"), 6).as("rank"))
  }
}
