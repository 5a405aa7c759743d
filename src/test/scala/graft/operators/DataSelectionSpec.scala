package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions

class DataSelectionSpec extends SparkSuite {
  import spark.implicits._

  test("unigramCrossEntropy: hand-computed corpus, surprising doc scores higher") {
    // corpus: "a" x 6, "b" x 2, "z" x 1, "y" x 1  (N = 10)
    val docs = Seq(
      (1L, "a a a b"),   // common words only
      (2L, "a a a b"),
      (3L, "z y")        // two hapaxes — maximally surprising
    ).toDF("doc_id", "text")
    val out = DataSelection.unigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val lnA = -math.log(6.0 / 10); val lnB = -math.log(2.0 / 10)
    val lnZ = -math.log(1.0 / 10)
    val h12 = BigDecimal((3 * lnA + lnB) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h3 = BigDecimal(lnZ)  // (lnZ + lnY) / 2, both ln(1/10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((4L, h12)) && out(2L) == ((4L, h12)), s"got $out")
    assert(out(3L) == ((2L, h3)), s"got $out")
    assert(out(3L)._2 > out(1L)._2, "hapax doc must be more surprising")
  }

  test("bigramCrossEntropy: hand-computed interpolation; word ORDER is the signal") {
    // corpus bigrams: "a b" x3 (docs 1,2,3), "b a" x1 (doc 4)
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"),
      (4L, "b a"),   // same words, flipped order — rarer continuation
      (5L, "a")      // no bigram: absent from output
    ).toDF("doc_id", "text")
    val out = DataSelection.bigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!out.contains(5L), "a 1-token doc has no bigram")
    // unigrams: a x5, b x4, N = 9
    val n = 9.0
    def h(cb: Double, cp: Double, cu: Double): Double =
      BigDecimal(-math.log(0.75 * (cb / cp) + 0.25 * (cu / n)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((1L, h(3, 5, 4))), s"got $out")  // p(b|a): cb=3 cp=5 cu(b)=4
    assert(out(4L) == ((1L, h(1, 4, 5))), s"got $out")  // p(a|b): cb=1 cp=4 cu(a)=5
    assert(out(4L)._2 > out(1L)._2,
      "the flipped-order doc must be more surprising than the common order")
  }

  test("unigramCrossEntropy: identical docs score identically on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = DataSelection.unigramCrossEntropy(docs, "doc_id", "text")
    assert(out.count() == docs.count(), "one row per doc")
    // cross-entropy is a pure function of the text: equal texts, equal score
    val perText = docs.select($"doc_id", $"text")
      .join(out, "doc_id")
      .groupBy($"text").agg(countDistinct($"cross_entropy").as("d"))
      .where($"d" > 1).count()
    assert(perText == 0, s"$perText texts got distinct scores")
  }

  test("dsirLogWeights: target-only vocabulary upweights target-like docs") {
    // target docs speak {t1,t2}, source-only docs speak {s1,s2}; a
    // held-out doc in the target vocabulary must outscore one in the
    // source-only vocabulary
    val docs = Seq(
      (1L, "t1 t2 t1 t2", "en"), (2L, "t2 t1 t2 t1", "en"),
      (3L, "s1 s2 s1 s2", "de"), (4L, "s2 s1 s2 s1", "de"),
      (5L, "t1 t2 t1 t2", "de"), // target-like text, source label
      (6L, "s1 s2 s1 s2", "fr")  // source-like text
    ).toDF("doc_id", "text", "lang")
    val out = DataSelection.dsirLogWeights(docs, "doc_id", "text",
        targetFilter = col("lang") === "en", nBuckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(5L) > out(6L),
      s"target-vocab doc must outweigh source-vocab doc: $out")
    assert(out(1L) > out(3L), s"target doc must outweigh source doc: $out")
    assert(out.values.forall(w => !w.isNaN && !w.isInfinite), s"degenerate: $out")
  }

  test("dsirLogWeights: empty target slice is all-smoothing, finite, flat-signed") {
    val docs = Seq((1L, "a b c", "en"), (2L, "d e f", "de")).toDF("doc_id", "text", "lang")
    val out = DataSelection.dsirLogWeights(docs, "doc_id", "text",
        targetFilter = col("lang") === "xx", nBuckets = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 2)
    // with zero target mass every ratio is ln(1/8 / p_s[b]) — finite
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite), s"got ${out.toSeq}")
  }

  test("gumbelTopK: deterministic, weight-dominant, salt re-draws") {
    // 50 heavy rows (log w = 5) vs 950 light rows (log w = -5): a
    // weight-proportional sample of 25 is overwhelmingly heavy — the
    // Gumbel noise is stdev ~1.3 against a 10-nat gap
    val rows = (0L until 1000L)
      .map(i => (i, if (i < 50) 5.0 else -5.0)).toDF("id", "lw")
    val a = DataSelection.gumbelTopK(rows, "id", "lw", k = 25)
      .as[(Long, Double, Double, Long)].collect()
    val b = DataSelection.gumbelTopK(rows, "id", "lw", k = 25)
      .as[(Long, Double, Double, Long)].collect()
    assert(a.toSeq == b.toSeq, "same salt must reproduce the same sample")
    assert(a.map(_._4).toSeq == (1L to 25L), s"ranks: ${a.map(_._4).toSeq}")
    assert(a.map(_._3).toSeq == a.map(_._3).sortBy(-_).toSeq, "keys descend")
    val heavy = a.count(_._1 < 50L)
    assert(heavy >= 23, s"only $heavy/25 heavy rows sampled")
    val c = DataSelection.gumbelTopK(rows, "id", "lw", k = 25, salt = "redraw")
      .as[(Long, Double, Double, Long)].collect()
    assert(c.map(_._1).toSet != a.map(_._1).toSet,
      "a different salt must draw a different sample")
  }

  test("temperatureResample: tau<1 lifts the tail source's rate, budget respected") {
    // head source: 90 docs x 10 tokens = 900; tail source: 10 docs x 10
    // tokens = 100. At tau=0.5 the tail's share rises from 10% to
    // sqrt(100)/(sqrt(900)+sqrt(100)) = 25%.
    val docs = ((0L until 90L).map(i => (i, (1 to 10).map(j => s"h$j").mkString(" "), "head")) ++
      (90L until 100L).map(i => (i, (1 to 10).map(j => s"t$j").mkString(" "), "tail")))
      .toDF("doc_id", "text", "source")
    val rows = DataSelection.temperatureResample(docs, "doc_id", "text",
        "source", tau = 0.5, budgetTokens = 400L)
      .as[(Long, String, Long, Double, Boolean)].collect()
    // head rate = 0.75 * 400 / 900 = 1/3; tail = 0.25 * 400 / 100 = 1.0
    val bySrc = rows.groupBy(_._2)
    assert(bySrc("tail").forall(_._4 == 1.0), s"tail rates: ${bySrc("tail").map(_._4).toSet}")
    assert(bySrc("head").forall(r => math.abs(r._4 - 1.0 / 3) < 1e-6),
      s"head rates: ${bySrc("head").map(_._4).toSet}")
    // rate 1.0 keeps everything; u < 1 always
    assert(bySrc("tail").forall(_._5), "tail must be fully kept at rate 1.0")
    // deterministic: same call, same keeps
    val again = DataSelection.temperatureResample(docs, "doc_id", "text",
      "source", tau = 0.5, budgetTokens = 400L)
      .as[(Long, String, Long, Double, Boolean)].collect().toSet
    assert(again == rows.toSet, "resample must be deterministic")
    // u is uniform-ish: the head keep count should land near 30 of 90
    val keptHead = bySrc("head").count(_._5)
    assert(keptHead > 5 && keptHead < 60, s"head kept $keptHead of 90")
  }

  test("temperatureResample: tau=1 reduces to proportional (uniform) rates") {
    val docs = Seq(
      (1L, "a b c d", "x"), (2L, "e f g h", "x"),
      (3L, "i j k l", "y")
    ).toDF("doc_id", "text", "source")
    val out = DataSelection.temperatureResample(docs, "doc_id", "text",
        "source", tau = 1.0, budgetTokens = 6L)
      .as[(Long, String, Long, Double, Boolean)].collect()
    // tau=1: share_s = n_s/N, rate = share*B/n_s = B/N = 6/12 for BOTH
    assert(out.forall(_._4 == 0.5), s"got ${out.toSeq}")
  }

  test("hashedLinearScore: exact integer scoring, label thresholds the int sum") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val out = DataSelection.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // identical text -> identical score; inference is deterministic
    assert(out(1L) == out(2L))
    // weights are integers in [-998, 998]: |score_int| <= 998 * n_tokens
    out.values.foreach { case (n, s, _, _) => assert(math.abs(s) <= 998 * n) }
    // the normalized score is score_int / (n_tokens * 1000), rounded 6dp
    val (n1, s1, sc1, l1) = out(1L)
    assert(n1 == 2L)
    assert(math.abs(sc1 - s1.toDouble / (n1 * 1000)) < 5e-7)
    assert(l1 == (s1 > 0), "label must threshold the integer sum")
  }

  test("hashedLinearScore: single-token docs score w(bucket)/1000 exactly") {
    // the weight function is ((h%64)*2654435761 % 1997) - 998 on the
    // portable token hash — replay it here as the executable spec
    val docs = Seq((1L, "alpha"), (2L, "zebra")).toDF("doc_id", "text")
    val out = DataSelection.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def polyHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % 281474976710656L)
    def w(t: String): Long = polyHash(t) % 64 * 2654435761L % 1997L - 998L
    assert(out(1L) == w("alpha"), s"got ${out(1L)}, want ${w("alpha")}")
    assert(out(2L) == w("zebra"))
  }

  test("trainHashedLinearProbe: trajectory equals a plain-Scala GD replay; SSE shrinks") {
    val texts = Map(
      1L -> "aa bb aa", 2L -> "bb cc", 3L -> "aa aa aa aa",
      4L -> "dd ee ff", 5L -> "cc cc dd")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val buckets = 8; val iters = 4; val lr = 0.01
    val out = DataSelection
      .trainHashedLinearProbe(docs, "doc_id", "text", buckets, iters, lr)
      .as[(Int, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size == iters * buckets, s"expected ${iters * buckets} rows")

    // plain-Scala replay of the documented arithmetic
    def hash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % (1L << 48))
    val feats: Map[(Long, Long), Long] = texts.toSeq
      .flatMap { case (id, s) => s.split(" ").map(t => (id, hash(t) % buckets)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ids = texts.keys.toList.sorted
    val y: Map[Long, BigDecimal] = ids.map { id =>
      val sc = feats.collect { case ((d, b), x) if d == id =>
        x * ((b * 2654435761L) % 1997L - 998L) }.sum
      id -> (if (sc > 0) BigDecimal(1) else BigDecimal(0))
    }.toMap
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dec6(v: Double) =
      BigDecimal(java.math.BigDecimal.valueOf(v).setScale(6))
    var w = Array.fill(buckets)(0.0)
    def sse(ws: Array[Double]): Double = ids.map { id =>
      val p = feats.collect { case ((d, b), x) if d == id =>
        dec6(ws(b.toInt)) * x }.sum
      val r = p - y(id); (r * r).toDouble
    }.sum
    val sse0 = sse(w)
    for (it <- 1 to iters) {
      val resid: Map[Long, BigDecimal] = ids.map { id =>
        val p = feats.collect { case ((d, b), x) if d == id =>
          dec6(w(b.toInt)) * x }.sum
        id -> (p - y(id))
      }.toMap
      w = Array.tabulate(buckets) { b =>
        val gs = feats.collect { case ((d, bb), x) if bb == b =>
          resid(d) * x }.sum
        r6(w(b) - lr * r6(gs.toDouble / ids.size))
      }
      for (b <- 0 until buckets)
        assert(out((it, b.toLong)) == w(b),
          s"iter $it bucket $b: got ${out((it, b.toLong))}, replay ${w(b)}")
    }
    assert(sse(w) < sse0, s"SSE must shrink: ${sse(w)} vs $sse0")
  }

  test("trainHashedLinearProbe: argument guards") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DataSelection.trainHashedLinearProbe(docs, "doc_id", "text", buckets = 1)
    }
    intercept[IllegalArgumentException] {
      DataSelection.trainHashedLinearProbe(docs, "doc_id", "text", iters = 0)
    }
    intercept[IllegalArgumentException] {
      DataSelection.trainHashedLinearProbe(docs, "doc_id", "text", lr = 0.0)
    }
  }

  test("noveltyScores: first-occurrence attribution by min doc id") {
    val docs = Seq(
      (1L, "a b c d"),      // trigrams "a b c", "b c d" -> both novel
      (2L, "a b c x"),      // "a b c" seen (doc 1), "b c x" novel -> 0.5
      (3L, "a b c d"),      // exact repeat -> nothing novel
      (4L, "q r"),          // < 3 tokens -> no shingles, absent
      (5L, "z z z z z")     // one distinct trigram "z z z", novel
    ).toDF("doc_id", "text")
    val out = DataSelection.noveltyScores(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L), s"doc 4 has no trigrams: ${out.keySet}")
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(5L) == ((1L, 1L, 1.0)), "repeated trigram counts once (distinct)")
  }

  test("noveltyScores plan: partial aggs + one shingle join, never a window") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c x")).toDF("doc_id", "text")
    val plan = DataSelection.noveltyScores(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"first-occurrence attribution must be a partial-agg min, not a window:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }

  test("vocabGrowth: bucketed first occurrences, running vocab, empty buckets present") {
    // ids 0..9, 5 buckets of 2 docs each; doc 2k repeats doc 0's text
    val docs = (0L to 9L).map { i =>
      val text = if (i % 2 == 0) "a b c d" else s"u$i v$i w$i x$i"
      (i, text)
    }.toDF("doc_id", "text")
    val out = DataSelection.vocabGrowth(docs, "doc_id", "text", n = 3, buckets = 5)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // evens contribute "a b c"/"b c d" once (bucket 0); each odd doc adds 2
    assert(out.map(_._1) == (0L to 4L).toSeq, "every bucket present")
    assert(out.head._2 == 4L, s"bucket 0: 2 shared + doc1's 2 novel: ${out.head}")
    assert(out.tail.forall(_._2 == 2L), s"later buckets: odd docs only: $out")
    assert(out.last._3 == 12L, "running vocab = total distinct shingles")
    val increments = out.map(_._3).zip(out.map(_._2)).scanLeft(0L) {
      case (acc, (_, n)) => acc + n }.tail
    assert(out.map(_._3) == increments, "vocab_size is the running sum of n_new")
  }

  test("conformalGateReport: threshold is the exact floor((n+1)a)-th smallest") {
    // 9 calibration scores 10..90; alpha=0.25 -> k = floor(10*0.25) = 2
    // -> threshold = 2nd smallest = 20.0
    val cal = (1 to 9).map(i => i * 10.0).toDF("s")
    val pool = Seq(5.0, 15.0, 20.0, 25.0, 100.0).toDF("s")
    val hold = Seq(19.0, 20.0, 21.0, 90.0).toDF("s")
    val r = DataSelection.conformalGateReport(cal, pool, hold, "s", 0.25)
      .collect()(0)
    assert(r.getAs[Long]("n_cal") == 9L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("threshold") == 20.0)
    assert(r.getAs[Long]("n_pool") == 5L && r.getAs[Long]("n_kept") == 3L,
      s"keep score >= 20 (20 itself kept): $r")
    assert(r.getAs[Long]("n_holdout") == 4L)
    assert(r.getAs[Double]("holdout_retention") == 0.75)
  }

  test("conformalGateReport: exchangeable holdout retains >= 1 - alpha - slack") {
    // scores from the portable LCG over 400 calibration + 400 holdout rows
    // drawn from one distribution: the conformal guarantee (in expectation)
    val all = spark.range(800).select($"id",
      TextFunctions.portableUniform(concat(lit("conf|"), $"id")).as("s"))
    val cal = all.where($"id" % 2 === 0)
    val hold = all.where($"id" % 2 === 1)
    val r = DataSelection.conformalGateReport(cal, hold, hold, "s", 0.2)
      .collect()(0)
    assert(r.getAs[Double]("holdout_retention") >= 0.7,
      s"retention ${r.getAs[Double]("holdout_retention")} too far below 1-alpha")
  }

  test("conformalGateReport: refuses calibration too small for alpha") {
    val cal = Seq(1.0, 2.0).toDF("s")
    val e = intercept[IllegalArgumentException] {
      DataSelection.conformalGateReport(cal, cal, cal, "s", 0.05)
    }
    assert(e.getMessage.contains("too small"))
  }

  test("doremiTrajectory: normalized, greedy toward high-excess, bounded") {
    // 3 domains, 4 rounds; domain 'c' has persistently higher excess
    val log = (1 to 4).flatMap { r =>
      Seq(("a", r, 0.1), ("a", r, 0.2), ("b", r, 0.3), ("b", r, 0.2),
        ("c", r, 0.8), ("c", r, 0.9))
    }.toDF("domain", "round", "excess")
    val t = DataSelection.doremiTrajectory(log, "round", "domain", "excess")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    val byRound = t.groupBy(_._1)
    byRound.foreach { case (r, rows) =>
      val s = rows.map(x => BigDecimal(x._3)).sum.toDouble
      assert(math.abs(s - 1.0) < 1e-5, s"round $r weights sum to $s")
      rows.foreach { case (_, d, a) =>
        assert(a >= 0.1 / 3 - 1e-9 && a <= 0.9 + 0.1 / 3 + 1e-9,
          s"alpha($d)=$a outside smoothing bounds")
      }
    }
    // c's weight strictly grows and dominates by the last round
    val cs = t.filter(_._2 == "c").sortBy(_._1).map(_._3)
    assert(cs.zip(cs.tail).forall { case (x, y) => y > x },
      s"c should gain weight every round: ${cs.toSeq}")
    val last = t.filter(_._1 == 4L)
    assert(last.maxBy(_._3)._2 == "c")
  }

  test("doremiTrajectory: missing (round, domain) cell means zero excess") {
    // domain 'b' reports no examples in round 2
    val log = Seq(("a", 1, 0.5), ("b", 1, 0.5), ("a", 2, 0.5))
      .toDF("domain", "round", "excess")
    val t = DataSelection.doremiTrajectory(log, "round", "domain", "excess")
      .where($"round" === 2 && $"domain" === "b").collect()
    assert(t.length == 1 && t(0).getDouble(2) == 0.0,
      "missing cell must surface as excess 0, not a dropped row")
  }

  test("doremiTrajectory: negative excess clips to zero (Group-DRO)") {
    val log = Seq(("a", 1, -3.0), ("b", 1, -1.0)).toDF("domain", "round", "excess")
    val t = DataSelection.doremiTrajectory(log, "round", "domain", "excess")
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(t("a") == t("b"), s"clipped excess must leave weights uniform: $t")
  }

  test("doremiTrajectory: a NULL per-example loss refuses, never deflates") {
    // greatest() skips NULLs — without the guard the null row would
    // count in the denominator and silently shrink lambda
    val log = Seq(("a", 1, Some(0.5)), ("a", 1, None), ("b", 1, Some(0.5)))
      .toDF("domain", "round", "excess")
    val e = intercept[IllegalArgumentException] {
      DataSelection.doremiTrajectory(log, "round", "domain", "excess")
    }
    assert(e.getMessage.contains("1 null/NaN/Infinite per-example losses"),
      s"expected the null refusal, got: ${e.getMessage}")
    // NaN would cast to a NULL decimal that sum() skips while the row
    // still counts in the denominator — must refuse, not deflate
    val nanLog = Seq(("a", 1, 0.5), ("a", 1, Double.NaN), ("b", 1, 0.5))
      .toDF("domain", "round", "excess")
    val e2 = intercept[IllegalArgumentException] {
      DataSelection.doremiTrajectory(nanLog, "round", "domain", "excess")
    }
    assert(e2.getMessage.contains("null/NaN/Infinite"),
      s"expected the NaN refusal, got: ${e2.getMessage}")
    val infLog = Seq(("a", 1, 0.5), ("b", 1, Double.PositiveInfinity))
      .toDF("domain", "round", "excess")
    val e3 = intercept[IllegalArgumentException] {
      DataSelection.doremiTrajectory(infLog, "round", "domain", "excess")
    }
    assert(e3.getMessage.contains("null/NaN/Infinite"),
      s"expected the Infinity refusal, got: ${e3.getMessage}")
  }

  test("conformalGateReport: empty pool or holdout refuses at readout") {
    val cal = (1 to 9).map(i => i * 10.0).toDF("s")
    val some = Seq(25.0, 100.0).toDF("s")
    val none = some.where($"s" < 0)
    val poolErr = intercept[Exception] {
      DataSelection.conformalGateReport(cal, none, some, "s", 0.25).collect()
    }
    assert(poolErr.getMessage.contains("empty pool"),
      s"expected the empty-pool raise, got: ${poolErr.getMessage}")
    val holdErr = intercept[Exception] {
      DataSelection.conformalGateReport(cal, some, none, "s", 0.25).collect()
    }
    assert(holdErr.getMessage.contains("empty holdout"),
      s"expected the empty-holdout raise, got: ${holdErr.getMessage}")
  }

  test("vocabRichness: hand-computed Chao2 and coverage") {
    // incidences: "a b c" in 2 docs; 4 trigrams in exactly 1 doc
    // D=5, N=6, q1=4, q2=1 -> chao2 = 5 + (2/3)*(4*3)/(2*2) = 7.0,
    // coverage = 1 - 4/6
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "x y z w v")
    ).toDF("doc_id", "text")
    val r = DataSelection.vocabRichness(docs, "doc_id", "text", n = 3).head()
    assert(r.getLong(0) == 3L, s"n_docs: $r")
    assert(r.getLong(1) == 5L && r.getLong(2) == 6L, s"D/N: $r")
    assert(r.getLong(3) == 4L && r.getLong(4) == 1L, s"q1/q2: $r")
    assert(r.getDouble(5) == 7.0, s"chao2: $r")
    assert(r.getDouble(6) ==
      BigDecimal(1.0 - 4.0 / 6.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"coverage: $r")
  }

  test("vocabRichness: per-doc repeats count once (incidence, not abundance)") {
    // the trigram "a b a" repeats inside doc 1 but is one incidence
    val docs = Seq((1L, "a b a b a"), (2L, "a b a")).toDF("doc_id", "text")
    val r = DataSelection.vocabRichness(docs, "doc_id", "text", n = 3).head()
    // doc1 trigrams: {a b a, b a b}; doc2: {a b a} -> D=2, N=3, q1=1, q2=1
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L, s"$r")
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L, s"$r")
    // chao2 = 2 + (1/2)*(1*0)/(2*2) = 2.0 (no singles-pair mass to extrapolate)
    assert(r.getDouble(5) == 2.0, s"$r")
  }

  test("vocabRichness: coverage 1 when nothing is rare") {
    val docs = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    val r = DataSelection.vocabRichness(docs, "doc_id", "text", n = 3).head()
    assert(r.getLong(3) == 0L, s"$r")
    assert(r.getDouble(6) == 1.0, s"all incidence mass already seen: $r")
    assert(r.getDouble(5) == r.getLong(1).toDouble,
      s"chao2 falls back to D when q1 = 0: $r")
  }
}
