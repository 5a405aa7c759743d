package graft.operators

import graft.SparkSuite

class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  private def words(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")

  test("duplicatedSpans: planted cross-doc span found, clean docs zero, covers merge") {
    // doc 1: tokens 0..19 unique-ish; doc 2 repeats doc 1's tokens 5..14
    // inside fresh context; doc 3 fully fresh
    val shared = words(5, 14)                       // 10 tokens
    val docs = Seq(
      (1L, words(0, 4) + " " + shared + " " + words(15, 19)),
      (2L, words(100, 104) + " " + shared + " " + words(200, 204)),
      (3L, words(300, 319))
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // duplicated anchors: every 3-gram fully inside the shared run —
    // 8 anchor positions covering exactly the 10 shared tokens, merged
    // into ONE span in each doc
    assert(out(1L) == ((20L, 1L, 10L, 0.5)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((20L, 1L, 10L, 0.5)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((20L, 0L, 0L, 0.0)), s"doc3: ${out(3L)}")
  }

  test("duplicatedSpans: within-doc repetition and split spans stay separate") {
    // doc repeats the SAME 4-token phrase at both ends, fresh middle gap
    // wider than k: two separate spans, each 4 tokens
    val phrase = words(1, 4)
    val doc = Seq(
      (7L, phrase + " " + words(50, 59) + " " + phrase)
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(doc, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(out == ((7L, 18L, 2L, 8L,
      BigDecimal(8.0 / 18).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)), s"got $out")
  }

  test("duplicatedSpans: short docs (< k tokens) survive with zero spans") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 0L, 0L, 0.0), (2L, 2L, 0L, 0L, 0.0)), s"got $out")
  }

  test("duplicatedSpans: whole-doc duplicates are one full-cover span") {
    val text = words(1, 12)
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 12L, 1L, 12L, 1.0), (2L, 12L, 1L, 12L, 1.0)),
      s"got $out")
  }

  test("stripDuplicatedSpans: shared run removed from every copy, order kept") {
    val shared = words(5, 14)
    val docs = Seq(
      (1L, words(0, 4) + " " + shared + " " + words(15, 19)),
      (2L, words(100, 104) + " " + shared + " " + words(200, 204)),
      (3L, words(300, 319))
    ).toDF("doc_id", "text")
    val out = SubstringDedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((20L, 10L, words(0, 4) + " " + words(15, 19))),
      s"doc1: ${out(1L)}")
    assert(out(2L) == ((20L, 10L, words(100, 104) + " " + words(200, 204))),
      s"doc2: ${out(2L)}")
    assert(out(3L) == ((20L, 20L, words(300, 319))), s"doc3: ${out(3L)}")
  }

  test("stripDuplicatedSpans: fully-duplicated doc survives as an empty accounting row") {
    val text = words(1, 10)
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = SubstringDedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set((1L, 10L, 0L, ""), (2L, 10L, 0L, "")), s"got $out")
  }

  test("stripDuplicatedSpans: strip is consistent with the duplicatedSpans report") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val report = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 5)
    val strip = SubstringDedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 5)
    val joined = report.join(strip.withColumnRenamed("n_tokens", "nt2"), "doc_id")
    assert(joined.where($"n_tokens" =!= $"nt2").count() == 0)
    // kept + covered must partition every document's tokens
    assert(joined.where($"n_kept" + $"dup_tokens" =!= $"n_tokens").count() == 0,
      "kept + duplicated-span tokens must cover each doc exactly")
  }
}
