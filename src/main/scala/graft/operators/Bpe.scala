package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE-RULE training (Sennrich, Haddow & Birch
  * 2016 — the subword-tokenizer trainer behind GPT-2/RoBERTa-class
  * vocabularies): iteratively count adjacent symbol pairs over the
  * corpus vocabulary, pick the most frequent pair (ties broken
  * lexicographically), fuse it into a new symbol everywhere, repeat.
  * The ordered merge list IS the trained artifact a tokenizer ships;
  * no reference analog — the tokenizer-training member of the
  * LLM-pipeline mandate next to token counting (q15) and vocab
  * coverage (q74).
  *
  * Scale shape — the real BPE-training economics: the corpus is read
  * ONCE (one explode + one partial-agg shuffle to the `(word, count)`
  * vocabulary, Heaps-sublinear in corpus size); every iteration after
  * that touches only the vocabulary table — one pair-count partial agg
  * (map-side combine caps output at pair-vocabulary size), one
  * TakeOrdered(1) argmax, one MAP-ONLY merge fold (no shuffle, no
  * join: the winning pair rides the closure as two literals). Driver
  * state = one (pair, count) row per iteration.
  *
  * The merge fold is greedy left-to-right (the reference semantics:
  * `a a a a` + merge(a,a) → `aa aa`), implemented as a single array
  * fold with a one-flag lookahead state — deterministic, and exactly
  * replayable by an engine-portable islands construction (consecutive
  * match positions keep odd ranks), which is what the oracle does.
  *
  * Returns `(iter, lhs, rhs, pair_count, token)` — the ordered merge
  * table, one row per iteration (fewer if the vocabulary exhausts its
  * pairs first). Words are whitespace tokens; each word gets the
  * standard `</w>` end-of-word marker symbol.
  */
object Bpe {

  def trainMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val init = Parallelism.ensureCompute(docs)
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(col("w"), col("c"),
        concat(filter(split(col("w"), ""), ch => ch =!= ""),
          array(lit("</w>"))).as("syms"))
    var cur = init.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[(Int, String, String, Long, String)]
    val esc = (s: String) => s.replace("'", "''")
    var exhausted = false
    for (it <- 1 to iters if !exhausted) {
      // guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) — a fully-fused
      // single-symbol word must contribute an empty pair list instead
      val top = cur.select(col("c"), explode(expr(
          """if(size(syms) < 2, cast(array() as array<struct<l: string, r: string>>),
             transform(sequence(1, size(syms) - 1),
             i -> named_struct('l', element_at(syms, i),
                               'r', element_at(syms, i + 1))))""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it, l, r, n, l + r))
        // greedy left-to-right fusion: one array fold, map-only; `skip`
        // marks that position i was consumed by a merge at i-1
        val next = cur.select(col("w"), col("c"), expr(
          s"""aggregate(sequence(1, size(syms)),
              named_struct('out', cast(array() as array<string>), 'skip', false),
              (acc, i) -> if(acc.skip,
                named_struct('out', acc.out, 'skip', false),
                if(i < size(syms) and element_at(syms, i) = '${esc(l)}'
                     and element_at(syms, i + 1) = '${esc(r)}',
                   named_struct('out', concat(acc.out, array('${esc(l + r)}')),
                     'skip', true),
                   named_struct('out', concat(acc.out, array(element_at(syms, i))),
                     'skip', false))),
              acc -> acc.out)""").as("syms"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the parent iteration
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    merges.result().toDF("iter", "lhs", "rhs", "pair_count", "token")
  }
}
