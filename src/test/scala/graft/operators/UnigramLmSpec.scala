package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("segment: Viterbi picks the cheaper multi-char piece, longest-first ties") {
    // vocab: chars cost 3 micro-nats each, 'ab' cost 4 -> 'aab' = a + ab (7)
    val vocab = Seq(("a", 3L), ("b", 3L), ("ab", 4L)).toDF("piece", "icost")
    val docs = Seq("aab").toDF("text")
    val segs = UnigramLm.segment(docs, "text", vocab)
      .orderBy($"s").collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cost")))
    assert(segs.toSeq == Seq(("a", 7L), ("ab", 7L)),
      s"expected a+ab at total cost 7: ${segs.toSeq}")
  }

  test("segment: backtrace tie-break prefers the longest piece") {
    // 'ab' exactly as expensive as a+b: tie at the end position ->
    // min packed (s*64+l) = smallest s = longest piece wins
    val vocab = Seq(("a", 3L), ("b", 3L), ("ab", 6L)).toDF("piece", "icost")
    val docs = Seq("ab").toDF("text")
    val segs = UnigramLm.segment(docs, "text", vocab).collect()
    assert(segs.length == 1 && segs(0).getAs[String]("piece") == "ab",
      s"tie must resolve to the single 2-char piece: ${segs.toSeq}")
  }

  test("segment: a word the vocab cannot cover raises, never null pieces") {
    // 'c' has no vocab entry: the DP lands at the Inf sentinel and the
    // backtrace edge sets are empty — refuse instead of emitting
    // null-piece rows costed at the sentinel
    val vocab = Seq(("a", 3L), ("b", 3L)).toDF("piece", "icost")
    val docs = Seq("abc").toDF("text")
    val e = intercept[Exception] {
      UnigramLm.segment(docs, "text", vocab).collect()
    }
    assert(e.getMessage.contains("unsegmentable under the supplied vocabulary"),
      s"expected the coverage raise, got: ${e.getMessage}")
  }

  test("plan shape: vocab edge build is an equi-join, top-multi is TakeOrdered") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val vocabPlan = UnigramLm.seedVocab(docs, "text", 4, 50)
      .queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject"),
      s"top-multi selection must not be a single-partition window:\n$vocabPlan")
    val segPlan = UnigramLm.segment(docs, "text",
      UnigramLm.seedVocab(docs, "text", 4, 50))
      .queryExecution.executedPlan.toString
    assert(!segPlan.contains("CartesianProduct") &&
      !segPlan.contains("BroadcastNestedLoopJoin"),
      s"piece lookup must stay an equi-join:\n$segPlan")
  }

  test("emRound: counts conserve corpus mass and re-estimated probs normalize") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val m = UnigramLm.emRound(docs, "text", maxPieceLen = 4, topMulti = 50)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // every used piece has a logp1; unused pieces have none (prune set)
    rows.foreach { r =>
      val cnt = r.getAs[Long]("viterbi_cnt")
      assert((cnt > 0) == !r.isNullAt(r.fieldIndex("logp1")), r.toString)
    }
    // sum of exp(logp1) over used pieces ~ 1 (each rounded to 6 dp)
    val probSum = rows.filter(!_.isNullAt(4))
      .map(r => math.exp(r.getAs[Double]("logp1"))).sum
    assert(math.abs(probSum - 1.0) < 1e-3, s"probs sum to $probSum")
    // Viterbi piece mass = total characters of all segmented words:
    // every word is exactly covered, so sum(cnt * len(piece)) ==
    // sum over words of freq * len
    val charMass = UnigramLm.words(docs, "text")
      .agg(sum($"freq" * $"len")).collect()(0).getLong(0)
    val pieceMass = m.where($"viterbi_cnt" > 0)
      .agg(sum($"viterbi_cnt" * length($"piece"))).collect()(0).getLong(0)
    assert(pieceMass == charMass,
      s"segmentations must tile the corpus: $pieceMass vs $charMass")
  }

  test("emTrajectory: corpus cost descends monotonically, coverage never breaks") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(120)
    val t = UnigramLm.emTrajectory(docs, "text", rounds = 4,
      maxPieceLen = 4, topMulti = 60)
      .orderBy($"round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // the EM bound holds for unrounded costs; each piece cost carries
    // <= 0.5 micro-nat rounding error, so allow slack of the corpus's
    // piece-occurrence mass in micro-nats (cost/typical-piece-cost
    // overestimates it comfortably)
    val costs = t.map(_._3)
    val slack = costs.head / 1000000L + 1L
    assert(costs.zip(costs.tail).forall { case (a, b) => b <= a + slack },
      s"EM corpus cost must be non-increasing up to rounding: ${costs.toSeq}")
    // vocab narrows (or holds) and never empties — coverage survives
    // because every word's previous-round pieces survive to the next
    val sizes = t.map(_._2)
    assert(sizes.forall(_ > 0))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a },
      s"used-piece counts cannot grow: ${sizes.toSeq}")
  }

  test("emRound: EM round never increases corpus cost under the new model") {
    // classic EM sanity: total Viterbi cost under seed costs >= the cost
    // of the SAME segmentation re-priced at the re-estimated probs
    // (counts are the argmax usage, so renormalizing toward them cannot
    // make the chosen segmentation less likely)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val vocab = UnigramLm.seedVocab(docs, "text", 4, 50)
    val seg = UnigramLm.segment(docs, "text", vocab)
    val m = UnigramLm.emRound(docs, "text", 4, 50)
    val priced = seg.join(m.select($"piece", $"logp1"), Seq("piece"))
    val before = priced.join(vocab.select($"piece", $"icost"), Seq("piece"))
      .agg(sum($"freq" * $"icost")).collect()(0).getLong(0).toDouble / 1e6
    val after = priced
      .agg(sum($"freq".cast("double") * -$"logp1")).collect()(0).getDouble(0)
    assert(after <= before + 1e-6,
      s"re-estimated model must not worsen the chosen segmentation: " +
        s"$after > $before")
  }

  test("softEmRound: expected counts match the hand-computed two-path lattice") {
    // corpus = one word "ab". Seed vocab: singles a, b + multi ab, each
    // with seed_freq 1 -> tot 3, icost = round(ln(3)*1e6) = 1098612 for
    // all three. Two segmentations: [a,b] mass p^2, [ab] mass p where
    // p = exp(-1.098612). Posteriors: P(two) = p^2/(p^2+p) = p/(p+1),
    // P(one) = 1/(p+1). Expected counts: c(a) = c(b) = P(two), c(ab) =
    // P(one) -- soft EM credits BOTH paths where Viterbi picks only [ab].
    val docs = Seq("ab").toDF("text")
    val m = UnigramLm.softEmRound(docs, "text", maxPieceLen = 2,
      topMulti = 10).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Double]("soft_cnt")).toMap
    val p = math.exp(-1098612.0 / 1e6)
    val pTwo = BigDecimal(p * p / (p * p + p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pOne = BigDecimal(p / (p * p + p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("a") == pTwo && m("b") == pTwo && m("ab") == pOne,
      s"expected a=b=$pTwo, ab=$pOne, got $m")
    // Viterbi (hard) on the same corpus keeps ONLY the single-piece path
    val hard = UnigramLm.emRound(docs, "text", maxPieceLen = 2,
      topMulti = 10).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("viterbi_cnt")).toMap
    assert(hard("ab") == 1L && hard("a") == 0L,
      s"hard EM must be winner-take-all here: $hard")
  }

  test("softEmRound: expected mass conserves per-word piece-count bounds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val m = UnigramLm.softEmRound(docs, "text", maxPieceLen = 4, topMulti = 50)
    val rows = m.collect()
    // probabilities renormalize over positive-mass pieces
    val probSum = rows.filter(!_.isNullAt(4))
      .map(r => math.exp(r.getAs[Double]("logp1"))).sum
    assert(math.abs(probSum - 1.0) < 1e-3, s"probs sum to $probSum")
    // soft mass >= hard mass support: every Viterbi-used piece carries
    // positive expected mass (the optimal path is one lattice path)
    val hard = UnigramLm.emRound(docs, "text", maxPieceLen = 4, topMulti = 50)
      .where(col("viterbi_cnt") > 0).select("piece").collect()
      .map(_.getString(0)).toSet
    val soft = rows.filter(r => r.getAs[Double]("soft_cnt") > 0)
      .map(_.getAs[String]("piece")).toSet
    assert(hard.subsetOf(soft),
      s"Viterbi-used pieces missing soft mass: ${hard -- soft}")
    assert(soft.size >= hard.size,
      "soft support must be at least the hard support")
  }

  test("trainVocabulary: prunes to target, keeps singles, post-prune lattice covers") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(120)
    val t = UnigramLm.trainVocabulary(docs, "text", targetVocab = 60,
      rounds = 2, maxPieceLen = 4, topMulti = 100)
      .orderBy("round").collect()
    assert(t.length == 2)
    // the prune lands AT the target when enough positive-mass multis
    // exist (seed had 100 multis; 60 - |alphabet| slots remain)
    t.foreach(r => assert(r.getAs[Long]("n_vocab") <= 60,
      s"vocab must not exceed the target: $r"))
    assert(t(0).getAs[Long]("n_vocab") == 60,
      s"first prune should fill the target from 100 seed multis: ${t.toSeq}")
    // round 2 ran a full lattice under the PRUNED vocab without the
    // Z=0 coverage raise -- the all-singles-kept invariant at work.
    // No LL direction is provable vs the unpruned model: dropping
    // low-mass pieces REDISTRIBUTES their probability to survivors
    // (renormalization), which can raise LL more than the lost paths
    // cost (it does here). The meaningful invariant is that the prune
    // is CHEAP: the 60-piece model stays within 10% of the 124-piece
    // model's round-2 likelihood (deterministic chains, stable bound).
    val unpruned = UnigramLm.softEmTrajectory(docs, "text", rounds = 2,
      maxPieceLen = 4, topMulti = 100).orderBy("round").collect()
    val pll = t(1).getAs[Double]("corpus_ll")
    val ull = unpruned(1).getAs[Double]("corpus_ll")
    assert(pll >= ull - 0.10 * math.abs(ull),
      s"pruning to 60 pieces should cost little likelihood: $pll vs $ull")
    // a target at or below the alphabet refuses (coverage)
    val e = intercept[IllegalArgumentException] {
      UnigramLm.trainVocabulary(docs, "text", targetVocab = 2, rounds = 1)
    }
    assert(e.getMessage.contains("single characters"))
    // determinism
    val t2 = UnigramLm.trainVocabulary(docs, "text", targetVocab = 60,
      rounds = 2, maxPieceLen = 4, topMulti = 100)
      .orderBy("round").collect()
    assert(t.map(_.toSeq).toSeq == t2.map(_.toSeq).toSeq)
  }

  test("trainVocabulary at width: 2048-target trains, two-round refusal is structural") {
    // the q261 corpus: customer names + zero-padded order-key renderings
    // under fixed key caps (byte-identical at every SF >= the caps)
    val docs = spark.read.parquet(s"$sf/customer.parquet")
      .where(col("c_custkey") < 1500).select(col("c_name").as("text"))
      .unionByName(spark.read.parquet(s"$sf/orders.parquet")
        .where(col("o_orderkey") < 1500)
        .select(concat(lit("Order#"),
          lpad(col("o_orderkey").cast("string"), 9, "0")).as("text")))
    // one round at a >=2k target fills exactly: 21 singles + 2027 multis
    val t = UnigramLm.trainVocabulary(docs, "text", targetVocab = 2048,
      rounds = 1, maxPieceLen = 4, topMulti = 4096).collect()
    assert(t.length == 1 && t(0).getAs[Long]("n_vocab") == 2048L,
      s"width target must fill at round 1: ${t.toSeq}")
    assert(t(0).getAs[Double]("corpus_ll") < 0.0)
    // TWO rounds at the same target refuse BY DESIGN: the re-estimated
    // model structurally starves mid-rank Customer#-tiling pieces
    // ('usto', 'mer'), so round 2's positive-mass inventory lands under
    // the target and the underfill guard must fire rather than ship a
    // silently narrower vocabulary
    val e = intercept[IllegalArgumentException] {
      UnigramLm.trainVocabulary(docs, "text", targetVocab = 2048,
        rounds = 2, maxPieceLen = 4, topMulti = 4096)
    }
    assert(e.getMessage.contains("positive-mass piece inventory"),
      s"expected the underfill refusal at round 2, got: ${e.getMessage}")
    // the hard-EM model at width: 21 singles + top-2024 multis, every
    // single present (coverage), costs strictly positive micro-nats
    val model = UnigramLm.emRound(docs, "text",
      maxPieceLen = 4, topMulti = 2024)
    assert(model.count() == 2045L)
    assert(model.where(length(col("piece")) === 1).count() == 21L)
    assert(model.where(col("cost0") <= 0).count() == 0L)
  }

  test("softEmTrajectory: corpus log-likelihood ascends monotonically") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(120)
    val t = UnigramLm.softEmTrajectory(docs, "text", rounds = 3,
      maxPieceLen = 4, topMulti = 50)
      .orderBy("round").collect()
    assert(t.length == 3)
    val lls = t.map(_.getAs[Double]("corpus_ll"))
    // EM ascends the true LL; integer cost rounding adds <= 0.5
    // micro-nat per piece occurrence, and occurrences <= characters --
    // the same slack bound the hard path documents
    val charMass = UnigramLm.words(docs, "text")
      .agg(sum(col("freq") * col("len"))).collect()(0).getLong(0)
    val slack = 1e-6 * charMass
    for (i <- 1 until lls.length)
      assert(lls(i) >= lls(i - 1) - slack,
        s"LL fell round ${i} -> ${i + 1}: ${lls.toSeq}")
  }

  test("natural documents corpus STARVES a 2048-wide target: the underfill " +
      "guard refuses with the measured inventory (never a silent underfill)") {
    // the q275 finding pinned structurally: 31 distinct words -> 24
    // singles + ~204 multi-pieces, so a 2048 target is unreachable on
    // natural text at any SF — the refusal is the correct behavior
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      UnigramLm.trainVocabulary(docs, "text", targetVocab = 2048,
        rounds = 1, maxPieceLen = 4, topMulti = 4096, maxWordLen = 20)
        .collect()
    }
    assert(e.getMessage.contains("unreachable"), e.getMessage)
    assert(e.getMessage.contains("targetVocab=2048"), e.getMessage)
    // and the audited variant enforces the same guard
    val e2 = intercept[IllegalArgumentException] {
      UnigramLm.trainVocabularyAudit(docs, "text", targetVocab = 2048,
        rounds = 1, maxPieceLen = 4, topMulti = 4096, maxWordLen = 20)
        .collect()
    }
    assert(e2.getMessage.contains("unreachable"), e2.getMessage)
  }

  test("trainVocabularyAudit == trainVocabulary on the shared columns, " +
      "kept_mass in (0, 1]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = UnigramLm.trainVocabulary(docs, "text", targetVocab = 120,
      rounds = 2, maxPieceLen = 4, topMulti = 4096, maxWordLen = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val audit = UnigramLm.trainVocabularyAudit(docs, "text",
      targetVocab = 120, rounds = 2, maxPieceLen = 4, topMulti = 4096,
      maxWordLen = 20).collect()
    assert(audit.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == base.toSeq,
      "audit variant must not change the training trajectory")
    audit.foreach { r =>
      val km = r.getDouble(3)
      assert(km > 0.0 && km <= 1.0, s"kept_mass $km out of (0, 1]")
    }
  }
}
