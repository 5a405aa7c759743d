package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching — find record pairs that refer to the same
  * real-world entity despite typos/drift in the string key. The classic
  * two-phase shape (Fellegi–Sunter lineage, the standard blocking
  * formulation): cheap BLOCKING passes propose candidate pairs, an
  * edit-distance VERIFY confirms them. No analog in the reference (its
  * joins are key-equality); added per the training-pipeline mandate —
  * author/source/license canonicalization in corpus metadata is entity
  * resolution.
  *
  * Scale: candidates are generated per blocking key (an equi-join
  * shuffle keyed by the block key — never all-pairs), each pass's block
  * sizes are capped (`maxBlockSize`, the q13f capped-bucket discipline:
  * a degenerate key like an empty name would otherwise go quadratic),
  * and multi-pass blocking recovers the recall a single mask loses —
  * a pair is caught when ANY pass co-blocks it. Verify is exact
  * Levenshtein (codegen'd) on the deduplicated candidate set only.
  */
object EntityResolution {

  /** Candidate pairs `(id_a, id_b, dist)` with `id_a < id_b` and
    * `levenshtein <= maxDist`, proposed by co-membership in any
    * blocking pass. `blockers` map the string column to a block key
    * (e.g. mask trailing characters, phonetic code, length bucket).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      blockers: Seq[Column => Column], maxDist: Int,
      maxBlockSize: Int = 10000): DataFrame = {
    require(blockers.nonEmpty, "at least one blocking pass required")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = Parallelism.ensureCompute(df)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    val candidates = blockers.zipWithIndex.map { case (blocker, i) =>
      val keyed = base.select(col("id"), col("s"),
        blocker(col("s")).as("bk"))
      // cap: oversized blocks dropped whole (documented recall tradeoff;
      // same contract as LSH bucket caps). The block sizes come from a
      // COUNTS-ONLY partial agg — (bk, count) rows, map-side combined —
      // and gate via a semi-join, so full rows shuffle on bk exactly
      // once, for the self-join itself (a count-per-key WINDOW would
      // shuffle + sort the full rows a second time for nothing but the
      // gate; EntityResolutionSpec pins the window-free plan).
      val okKeys = keyed.groupBy(col("bk")).agg(count(lit(1)).as("bs"))
        .where(col("bs") <= maxBlockSize)
        .select(col("bk"))
      val capped = keyed.join(okKeys, Seq("bk"), "left_semi")
      capped.as("a").join(capped.as("b"),
          col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.s").as("s_a"), col("b.s").as("s_b"))
    }.reduce(_ unionByName _)
    candidates.distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
