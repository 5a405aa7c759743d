package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Lexical retrieval: inverted-index banding and BM25 ranking semantics. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffles data between executors during wide stages"),
    (2L, "spark spark spark tuning spark memory spark settings"),
    (3L, "window functions rank rows within partitions"),
    (4L, "the the the the the the the the"),
    (5L, "merge upserts change data into warehouse tables"),
    (6L, "spark window merge all in one pipeline")
  ).toDF("doc_id", "text")

  test("invertedIndex: postings sorted+complete, df band drops hapax and stopword tiers") {
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(idx("spark") == ((3L, 7L, Seq(1L, 2L, 6L))), idx("spark"))
    assert(idx("merge") == ((2L, 2L, Seq(5L, 6L))), idx("merge"))
    // band: minDf=2 kills hapaxes, maxDfFraction keeps "the" (1 of 6 docs) out
    val banded = Retrieval.invertedIndex(corpus, "doc_id", "text",
        minDf = 2, maxDfFraction = 0.4)
      .select($"term").as[String].collect().toSet
    assert(banded.contains("merge") && banded.contains("window"))
    assert(!banded.contains("executors"), "hapax must fall below minDf")
    assert(!banded.contains("spark"), "3/6 docs is above the 0.4 df fraction")
  }

  test("bm25TopK ranks all-terms doc first, repetition saturates, k caps output") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 3)
    val rows = top.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 3)
    assert(rows.head._1 == 6L, s"doc 6 holds all three terms: ${rows.mkString(", ")}")
    // saturation: doc 2's five "spark"s must not outscore three distinct terms
    assert(rows.head._2 > rows(1)._2)
    val scores = rows.map(_._2).toSeq
    assert(scores == scores.sorted.reverse, "descending order")
    // determinism
    val again = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 3).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == again.toSeq)
  }

  test("bm25TopK plans as TakeOrderedAndProject — no global sort") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 2)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("query term absent from the corpus contributes zero, not NaN") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("nonexistent_token", "spark"), k = 2)
    val scores = top.select($"score").as[Double].collect()
    assert(scores.forall(s => !s.isNaN && s > 0.0), scores.mkString(", "))
  }

  test("rrfFuse: score math, absent-list zeros, ordering and fused_rank") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0),
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3), r.getInt(4))))
      .toMap
    def rrf(rs: Double*): Double = rs.map(r => 1.0 / (60.0 + r)).sum
    def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9
    // 10 and 20 appear in both lists at ranks {1,2} — tied score, id breaks
    assert(close(fused(10L)._3, rrf(1, 2)) && close(fused(20L)._3, rrf(2, 1)))
    assert(fused(10L)._4 == 1 && fused(20L)._4 == 2, s"id tiebreak: $fused")
    // 30/40 are single-list: the missing list contributes exactly zero
    assert(close(fused(30L)._3, rrf(3)) && fused(30L)._2.isEmpty)
    assert(close(fused(40L)._3, rrf(3)) && fused(40L)._1.isEmpty)
    assert(fused(30L)._4 == 3 && fused(40L)._4 == 4, "30 before 40 on id")
  }

  test("rrfFuse: k caps the fused list, not the inputs") {
    val a = (1 to 8).map(i => (i.toLong, i)).toDF("id", "rank")
    val b = (1 to 8).map(i => (i.toLong + 100, i)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rank", k = 5)
    assert(out.count() == 5)
    // rank 1 of each list ties at 1/61; id 1 wins the tie over id 101
    assert(out.orderBy($"fused_rank").first().getLong(0) == 1L)
  }

  test("pmiCollocations: exact counts, attraction positive, band prunes") {
    // "new york" always together (attraction); "a"/"b" co-occur at chance
    val docs = Seq.fill(8)("new york a b") ++ Seq.fill(8)("a new york b")
    val out = Retrieval.pmiCollocations(docs.toDF("text"), "text", minCount = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val (cNy, pmiNy) = out(("new", "york"))
    assert(cNy == 16L, "every doc holds one 'new york'")
    // c=16, N_u=64, c_new=c_york=16: pmi = ln(16*64²/(48*16*16)) = ln(16/3)
    assert(math.abs(pmiNy - math.log(16.0 / 3)) < 1e-5, s"got $pmiNy")
    assert(pmiNy > 0, "collocation must attract")
    // minCount band: "york a" appears 8 times -> present at band 8,
    // pruned at band 9
    assert(out.contains(("york", "a")))
    val banded = Retrieval.pmiCollocations(docs.toDF("text"), "text", minCount = 9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(banded == Set(("new", "york")), s"got $banded")
  }

  test("rerankByCosine: dense order replaces lexical order inside the candidate set") {
    val cands = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)),   // lexical best, orthogonal to the query
      (2L, Array(0.7f, 0.7f)),
      (3L, Array(1.0f, 0.0f)),   // lexical worst, dense best
      (4L, Array(1.0f, 0.0f))    // perfect match but NOT a candidate
    ).toDF("vid", "vec")
    val out = Retrieval.rerankByCosine(cands, "id", "score",
        vecs, "vid", "vec", queryVec = Array(1.0f, 0.0f), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(3L, 2L),
      "dense order must invert the lexical order; non-candidates unreachable")
    assert(out.head._3 == 1.0 && out.head._4 == 1L)
    assert(out(1)._2 == 5.0, "stage-1 score rides along")
  }

  test("rerankByCosine plan: candidates broadcast, top-k never global-sorts the vectors") {
    val cands = Seq((1L, 9.0), (2L, 5.0)).toDF("id", "score")
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vid", "vec")
    val plan = Retrieval.rerankByCosine(cands, "id", "score",
      vecs, "vid", "vec", queryVec = Array(1.0f, 0.0f), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate set must broadcast to the vector table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the vector table must never shuffle for the join:\n$plan")
  }

  test("rerankByCosine: equal-sim ties break by ascending id, rank is dense order") {
    val cands = Seq((10L, 1.0), (7L, 2.0), (5L, 3.0)).toDF("id", "score")
    val vecs = Seq(
      (5L, Array(0.0f, 1.0f)),
      (7L, Array(1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f))).toDF("vid", "vec")
    val out = Retrieval.rerankByCosine(cands, "id", "score",
        vecs, "vid", "vec", queryVec = Array(1.0f, 0.0f), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out == Seq((7L, 1L), (10L, 2L), (5L, 3L)), s"got $out")
  }

  test("ndcgAtK: perfect ranking scores 1, reversed ranking scores less") {
    import spark.implicits._
    val rels = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L)).toDF("id", "rel")
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val p = Retrieval.ndcgAtK(perfect, "id", "rank", rels, "id", "rel", k = 3)
      .as[(Double, Double, Double)].head()
    assert(p._3 == 1.0, s"perfect ranking must hit nDCG 1: $p")
    // hand DCG: (2^3-1)/log2(2) + (2^2-1)/log2(3) + (2^1-1)/log2(4)
    val r6 = (v: Double) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(r6(7.0 / 1.0)) +
      BigDecimal(r6(3.0 / (math.log(3.0) / math.log(2.0)))) +
      BigDecimal(r6(1.0 / 2.0))
    assert(p._1 == r6(want.toDouble), s"hand DCG mismatch: ${p._1} vs $want")
    val reversed = Seq((3L, 1L), (2L, 2L), (1L, 3L)).toDF("id", "rank")
    val r = Retrieval.ndcgAtK(reversed, "id", "rank", rels, "id", "rel", k = 3)
      .as[(Double, Double, Double)].head()
    assert(r._3 < p._3, s"reversed must score lower: $r")
    assert(r._2 == p._2, "ideal DCG is ranking-independent")
  }

  test("ndcgAtK: unjudged docs gain zero; ranker penalized for missing relevant docs") {
    import spark.implicits._
    val rels = Seq((1L, 3L), (2L, 3L)).toDF("id", "rel")
    // ranking retrieves one relevant + one unjudged doc
    val ranked = Seq((1L, 1L), (99L, 2L)).toDF("id", "rank")
    val out = Retrieval.ndcgAtK(ranked, "id", "rank", rels, "id", "rel", k = 2)
      .as[(Double, Double, Double)].head()
    // dcg = 7/log2(2) = 7; idcg = 7 + 7/log2(3)
    assert(out._1 == 7.0, s"got $out")
    assert(out._3 < 1.0, "missing the second relevant doc must cost nDCG")
  }
}
