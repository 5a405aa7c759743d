package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level storage dedup via content-defined chunking
  * ([[graft.plans.CdcOps]] — the Gear/LBFS rolling-hash family). Where
  * [[SubstringDedup]] finds duplicated SPANS for corpus hygiene, this
  * is the STORAGE ledger: identical chunks across documents (mirrored
  * boilerplate, quoted passages, re-uploaded blobs with small edits)
  * are stored once and referenced; because boundaries follow content,
  * an edit reshapes only the chunks it touches and the rest of the
  * document keeps deduplicating — the property fixed-size blocks lack.
  *
  * Scale shape: chunking is map-only (one codegen'd pass per
  * document); the ledger is one (chunk_key)-keyed partial-agg shuffle
  * whose rows are chunk-count-sized, never content-sized — chunk keys
  * are 8-byte packed (hash, len) values.
  */
object ChunkDedup {

  /** Per-document chunk table `(doc_id, chunk_idx, chunk_key,
    * chunk_len)` — `chunk_key` packs the 48-bit content fold with the
    * length; expected chunk length ≈ `modulus` symbols.
    */
  def chunkTable(docs: DataFrame, idCol: String, textCol: String,
      modulus: Long = 64L): DataFrame =
    Parallelism.ensureCompute(docs)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.plans.CdcExpressions.cdcChunks(col(textCol), modulus)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_key"),
        shiftright(col("col"), 48).as("chunk_len"))

  /** The dedup ledger: every chunk stored MORE than once — reference
    * count, distinct holding documents, and the symbols reclaimable by
    * single-instancing (`(n_refs − 1) · chunk_len`). Sorted output is
    * the caller's concern; rows are already ledger-sized.
    */
  def duplicatedChunks(docs: DataFrame, idCol: String, textCol: String,
      modulus: Long = 64L): DataFrame =
    chunkTable(docs, idCol, textCol, modulus)
      .groupBy(col("chunk_key"), col("chunk_len"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_refs") >= 2)
      .select(col("chunk_key"), col("chunk_len"), col("n_refs"), col("n_docs"),
        ((col("n_refs") - 1L) * col("chunk_len")).as("reclaimable"))
}
