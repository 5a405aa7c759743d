package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star operator).
  *
  * Two tiers:
  *  - [[topKJoin]]: exact brute-force cosine top-k of a (small, broadcast)
  *    query batch against the corpus — one corpus scan, no corpus shuffle
  *    except the final per-query top-k aggregation. The correctness
  *    baseline.
  *  - [[lshTopKJoin]]: random-hyperplane LSH bucketing — corpus and queries
  *    are signed into `bits`-bit buckets; only same-bucket (plus
  *    multi-probe neighbor buckets) pairs are scored. The 100 TB path:
  *    candidate count drops by ~2^bits while recall stays tunable via
  *    bits/probes.
  *
  * Per-query top-k ranking windows on q_id after the candidate cut; the
  * window input is |queries| * |candidates-per-query| rows, never the raw
  * corpus.
  */
object Similarity {

  /** Exact cosine top-k per query row. `queries` must be small (broadcast).
    * Scores rounded to 6 dp BEFORE ranking so rank boundaries are stable
    * across FP summation orders; ties broken by corpus id.
    */
  def topKJoin(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorExpressions.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("c_id").as("vec_id"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: hyperplane signatures on both sides,
    * candidates = same bucket under any of the single-bit-flip probes
    * (multi-probe: probes=0 -> exact bucket only). Recall < 1 by design;
    * verify-time cosine is exact.
    */
  def lshTopKJoin(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, dim: Int, bits: Int = 12, probes: Int = 2, seed: Long = 42L): DataFrame = {
    val sigC = VectorFunctions.hyperplaneSignature(col("c_vec"), dim, bits, seed)
    val sigQ = VectorFunctions.hyperplaneSignature(col("q_vec"), dim, bits, seed)
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"), sigC.as("bucket"))
    // each query probes its own bucket + `probes` single-bit flips
    val probeArr = sequence(lit(0), lit(probes))
    val q = queries
      .select(col(qId).as("q_id"), col(qVec).as("q_vec"), sigQ.as("sig"))
      .select(col("q_id"), col("q_vec"),
        explode(array_distinct(transform(probeArr, p =>
          when(p === 0, col("sig"))
            .otherwise(col("sig").bitwiseXOR(
              call_function("shiftleft", lit(1L), p - 1)))))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorExpressions.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("c_id").as("vec_id"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest of `nLists` centroids (one partition-pruned "inverted
    * list" each); a query scores only the vectors in its `nProbe` nearest
    * lists. The 100 TB deployment writes the corpus bucketed/partitioned by
    * `list` so a probe reads only those partitions.
    *
    * Centroids here are chosen deterministically (every corpus-size/nLists-th
    * vector by id — a seeded sample stand-in for k-means; the operator is
    * agnostic to how centroids were trained and accepts them as a plain
    * (id, vector) DataFrame).
    */
  def ivfTopKJoin(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, nLists: Int = 16, nProbe: Int = 2): DataFrame = {
    val c0 = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"))
    // deterministic centroid seeds: the nLists lowest-id vectors (a k-means
    // training step would refine these; the operator only needs SOME fixed
    // centroid set and takes it from the corpus head, a bounded collect)
    val centroids = c0.orderBy(col("c_id")).limit(nLists).collect()
    val centArr = centroids.map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    // argmax-cosine centroid assignment as one expression over a literal
    // centroid array (small by construction: nLists entries)
    def best(vec: Column, n: Int): Column = {
      val scored = centArr.zipWithIndex.map { case ((cid, cv), i) =>
        struct(
          VectorExpressions.cosine(vec,
            array(cv.map(x => lit(x)): _*).cast("array<float>")).as("sim"),
          lit(cid).as("list"))
      }
      // top-n lists by similarity
      slice(reverse(array_sort(array(scored: _*))), 1, n)
    }
    val cAssigned = c0.withColumn("list", best(col("c_vec"), 1).getItem(0).getField("list"))
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
      .withColumn("list", explode(transform(best(col("q_vec"), nProbe), s => s.getField("list"))))
    val scored = cAssigned.join(broadcast(q), Seq("list"))
      .where(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorExpressions.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("c_id").as("vec_id"), col("sim"))
  }

  /** All-pairs near-duplicate detection by embedding cosine >= threshold,
    * LSH-bucketed (the embedding-space sibling of [[MinHashDedup]]).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 12, seed: Long = 42L): DataFrame = {
    val sig = VectorFunctions.hyperplaneSignature(col(vecCol), dim, bits, seed)
    val t = df.select(col(idCol).as("id"), col(vecCol).as("vec"), sig.as("bucket"))
    val l = t.select(col("bucket"), col("id").as("idA"), col("vec").as("vecA"))
    val r = t.select(col("bucket"), col("id").as("idB"), col("vec").as("vecB"))
    l.join(r, Seq("bucket"))
      .where(col("idA") < col("idB"))
      .withColumn("sim", VectorExpressions.cosine(col("vecA"), col("vecB")))
      .where(col("sim") >= threshold)
      .select("idA", "idB", "sim")
  }
}
