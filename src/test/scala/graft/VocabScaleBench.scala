package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** SCALE.md evidence: [[UnigramLm.trainVocabulary]] at a REAL tokenizer
  * vocab target (8k–32k pieces). The committed queries run at toy vocab
  * because the synthetic documents corpus collapses to 40 distinct
  * words / 276 distinct pieces (the same distinct-word collapse that
  * makes soft-EM sublinear caps its vocabulary), so this harness builds
  * a deterministic rich lexicon: `nWords` distinct words, each the
  * base-26 rendering of its id concatenated with the rendering of a
  * Knuth-multiplied twin (6–9 chars), sampled 30 per doc by xxhash64 —
  * a substring inventory in the hundreds of thousands. Not shipped in
  * the bench surface — run by hand, numbers recorded in SCALE.md.
  *
  * Usage: runMain graft.VocabScaleBench [targetVocab] [nDocs] [nWords]
  */
object VocabScaleBench {
  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0).toInt else 8192
    val nDocs = if (args.length > 1) args(1).toInt else 100000
    val nWords = if (args.length > 2) args(2).toInt else 50000
    val spark = Sessions.local(32, "vocabscale")
    def render(c: org.apache.spark.sql.Column) =
      translate(lower(conv(c.cast("string"), 10, 26)),
        "0123456789", "qrstuvwxyz")
    val wordOf = (id: org.apache.spark.sql.Column) =>
      concat(render(id), render(pmod(id * 2654435761L, lit(Int.MaxValue))))
    val docs = spark.range(nDocs).select(
      concat_ws(" ", transform(sequence(lit(0), lit(29)), p =>
        wordOf(pmod(xxhash64(col("id") * 31 + p), lit(nWords.toLong)))))
        .as("text")).localCheckpoint()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"VOCABSCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // lattice-shape stats: distinct words and candidate (piece
    // occurrence) rows — the per-round scan mass
    val w = UnigramLm.words(docs, "text").localCheckpoint()
    val wn = w.count()
    val cands = w.select(col("len"),
      aggregate(transform(sequence(lit(1L), col("len")),
        s => least(lit(4L), col("len") - s + 1L)), lit(0L), (a, b) => a + b)
        .as("nc"))
      .agg(sum(col("nc")), max(col("len"))).head()
    println(s"VOCABSCALE corpus nDocs=$nDocs distinctWords=$wn " +
      s"candRows=${cands.getLong(0)} maxLen=${cands.getLong(1)} target=$target")
    val traj = time(s"trainVocabulary target=$target rounds=2") {
      UnigramLm.trainVocabulary(docs, "text", targetVocab = target,
        rounds = 2, maxPieceLen = 4, topMulti = 2 * target,
        maxWordLen = 20).collect()
    }
    traj.foreach(r => println(s"VOCABSCALE round=${r.getLong(0)} " +
      s"n_vocab=${r.getLong(1)} corpus_ll=${r.getDouble(2)}"))
    spark.stop()
  }
}
