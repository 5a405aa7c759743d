package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** EXACT duplicated-substring detection at word granularity — the
  * operator shape of Lee et al. 2021 ("Deduplicating Training Data
  * Makes Language Models Better"): a span duplicated ANYWHERE in the
  * corpus (across documents or repeated inside one) is training signal
  * the model memorizes instead of learning. The published system builds
  * a corpus-wide suffix array; the Spark-native equivalent is k-token
  * anchor grams — every length->=k duplicated substring is a run of
  * duplicated k-grams, so flagging duplicated anchors and merging
  * overlapping covers recovers exactly the union of duplicated spans
  * (with k the minimum match length, Lee et al. use 50 BPE tokens).
  *
  * No analog in the reference; added per the training-pipeline mandate
  * alongside the MinHash/SimHash NEAR-dup family ([[MinHashDedup]]) —
  * this one is exact and position-aware where those are set-level.
  */
object SubstringDedup {

  private final val M = 1L << 48

  /** Positional (NOT distinct) portable k-gram hashes over a token-hash
    * array: gram at 0-based token position p covers tokens [p, p+k-1],
    * hash = 48-bit fold ((acc*31 + th) % 2^48) — the
    * [[TextFunctions.portableShingleHashes]] arithmetic with positions
    * kept, so every value replays in the oracle.
    */
  private def positionalGramHashes(ths: org.apache.spark.sql.Column, k: Int) =
    when(size(ths) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(ths) - (k - 1)),
        i => aggregate(slice(ths, i, lit(k)), lit(0L),
          (a, h) => (a * lit(31L) + h) % lit(M))))

  /** Per-document duplicated-span report: `(doc_id, n_tokens, n_spans,
    * dup_tokens, dup_frac)` for EVERY input document — `n_spans` maximal
    * duplicated regions, `dup_tokens` tokens they cover. A k-gram is
    * duplicated when its hash occurs at more than one (doc, position) in
    * the corpus; a span is a maximal union of the [p, p+k-1] covers of
    * duplicated anchors.
    *
    * Scale shape: one posexplode, one (hash)-keyed partial-agg count
    * (counts only — position lists are never collected per hash), a
    * semi-join of positions against the duplicated hash set, then
    * per-document windows over ONLY the duplicated positions (a document
    * contributes zero rows when clean — the common case — so window
    * partitions stay small even on 100 TB; a document that is ONE giant
    * duplicated run contributes its positions once, linear not
    * quadratic). The hash-key shuffle is uniform by construction (48-bit
    * hashes), immune to hot-token skew — the gram fold randomizes even
    * a corpus that is 50% one word.
    *
    * Portability: everything is integer arithmetic until the final
    * `dup_tokens / n_tokens` division; the oracle replays gram hashes,
    * duplicate sets, interval merge and fractions exactly.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"anchor width must be >= 2 tokens, got $k")
    val base = Parallelism.ensureCompute(docs)
      .select(col(idCol).as("doc_id"),
        TextFunctions.portableTokenHashes(col(textCol)).as("ths"))
      .select(col("doc_id"), size(col("ths")).cast("long").as("n_tokens"),
        positionalGramHashes(col("ths"), k).as("ghs"))
    val pos = base.select(col("doc_id"),
      posexplode(col("ghs")).as(Seq("p", "gh")))
    val dupHashes = pos.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1)
    val dupPos = pos.join(dupHashes, Seq("gh"), "left_semi")
    // merge [p, p+k-1] covers: a new span starts when the gap to the
    // previous duplicated anchor exceeds the cover width
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = dupPos
      .withColumn("new_span",
        when(col("p") - lag(col("p"), 1).over(byDoc) > k, 1)
          .otherwise(when(lag(col("p"), 1).over(byDoc).isNull, 1).otherwise(0)))
      .withColumn("span_id", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg((max(col("p")) - min(col("p")) + k).cast("long").as("span_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_frac"))
  }

  /** APPLY the duplicated-span finding: rebuild every document with all
    * duplicated spans removed (the aggressive variant Lee et al. §4
    * evaluate — drop every copy; the keep-one policy is a dedup-group
    * canonical-pick away, [[MinHashDedup]] owns that machinery). Returns
    * `(doc_id, n_tokens, n_kept, clean_text)` for every input doc — a
    * fully-duplicated doc survives as an accounting row with empty text.
    *
    * Scale shape: the covered-position set comes straight from the
    * duplicated anchors (`explode(sequence(p, p+k-1))` + distinct — no
    * window, no span materialization), the keep-side is one anti-join
    * keyed by (doc, position), and reassembly is the [[TrainingPrep
    * .removeBoilerplate]] discipline: per-doc sorted struct collect —
    * state bounded by ONE document's tokens, only for docs that lost
    * something (untouched docs pass through without reassembly).
    */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"anchor width must be >= 2 tokens, got $k")
    val base = Parallelism.ensureCompute(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        TextFunctions.portableTokenHashes(col(textCol)).as("ths"))
      .select(col("doc_id"), col("text"),
        size(col("ths")).cast("long").as("n_tokens"),
        positionalGramHashes(col("ths"), k).as("ghs"))
    val pos = base.select(col("doc_id"),
      posexplode(col("ghs")).as(Seq("p", "gh")))
    val dupHashes = pos.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1)
    val covered = pos.join(dupHashes, Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("tp"))
      .distinct()
    val kept = base
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("tp", "tok")))
      .join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
