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

  /** FELLEGI–SUNTER probabilistic linkage scoring (Fellegi & Sunter
    * 1969, the model behind Splink/RecordLinkage): each comparison
    * field contributes `log2(m/u)` on agreement and
    * `log2((1−m)/(1−u))` on disagreement — m = P(agree | match),
    * u = P(agree | non-match) — and the pair's match weight is the
    * sum. `fields` maps an agreement BOOLEAN column (built by the
    * caller: exact equality, prefix match, phonetic code — anything)
    * to its (m, u). A NULL agreement contributes 0 (the standard
    * missing-comparison convention).
    *
    * Exactness: the per-field log weights are computed ONCE on the
    * driver, rounded to 6 dp, and ride as DECIMAL(18,6) literals; the
    * pair weight is their EXACT decimal sum (order-independent, so an
    * oracle replays it bit-for-bit from the same constants). Map-only
    * over the candidate pairs — u-estimation pairs with the blocked
    * candidate generators above; at 100 TB the weights cost one
    * projection.
    */
  def linkageWeights(pairs: DataFrame,
      fields: Seq[(String, Double, Double)]): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    fields.foreach { case (c, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"m and u must be in (0,1) for $c, got m=$m u=$u")
      require(m > u, s"agreement must be evidence FOR a match: m > u for $c " +
        s"(got m=$m u=$u); flip the comparison if agreement implies non-match")
    }
    val terms = fields.map { case (c, m, u) =>
      val agree = BigDecimal(math.log(m / u) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val disagree = BigDecimal(math.log((1 - m) / (1 - u)) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      when(col(c).isNull, lit("0").cast("decimal(18,6)"))
        .when(col(c), lit(agree.toString).cast("decimal(18,6)"))
        .otherwise(lit(disagree.toString).cast("decimal(18,6)"))
    }
    pairs.withColumn("link_weight",
      terms.reduce(_ + _).cast("decimal(28,6)").cast("double"))
  }

  /** Splink-style u-ESTIMATION: `u = P(agree | non-match)` measured on
    * pseudo-random record pairs — two disjoint deterministic slices of
    * the table (`id % cells == 0` crossed with `== 1`; at realistic
    * match rates a random cross-slice pair is a non-match with
    * overwhelming probability, the standard estimator assumption).
    * `fields` rows are `(fieldName, sourceColumn, comparison)` — the
    * comparison receives the left and right side's column, the SAME
    * predicates the caller feeds [[linkageWeights]]. Returns one row
    * per field:
    * `(field, n_pairs, n_agree, u)` with `u` rounded 6 dp; m stays the
    * caller's prior or labeled-pair estimate (EM is a training-time
    * concern, not an engine one).
    *
    * Scale shape: slice sizes are |df|/cells, so the cross is
    * (|df|/cells)² pairs — `cells` prices the estimate exactly like a
    * pair budget; slices broadcast when small. Deterministic slices
    * make the estimate replayable (and the oracle can).
    */
  def estimateU(df: DataFrame, idCol: String,
      fields: Seq[(String, String, (Column, Column) => Column)],
      cells: Int = 97): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    require(cells >= 2, s"cells must be >= 2, got $cells")
    val a = df.where(pmod(col(idCol).cast("long"), lit(cells)) === 0)
      .select(df.columns.map(c => col(c).as(s"a_$c")).toIndexedSeq: _*)
    val b = df.where(pmod(col(idCol).cast("long"), lit(cells)) === 1)
      .select(df.columns.map(c => col(c).as(s"b_$c")).toIndexedSeq: _*)
    val pairs = a.crossJoin(b)
    val aggs = fields.flatMap { case (name, srcCol, cmp) =>
      val agree = cmp(col(s"a_$srcCol"), col(s"b_$srcCol"))
      // coalesce: sum() over ZERO pairs (an empty id%cells slice) is
      // NULL — a count column must read 0, matching the oracle's
      // coalesce(sum(...), 0)
      Seq(count(lit(1)).as(s"__n_$name"),
        coalesce(sum(when(agree, 1L).otherwise(0L)), lit(0L)).as(s"__ag_$name"))
    }
    val one = pairs.agg(aggs.head, aggs.tail: _*)
    fields.map { case (name, _, _) =>
      one.select(lit(name).as("field"),
        col(s"__n_$name").as("n_pairs"),
        col(s"__ag_$name").as("n_agree"),
        round(col(s"__ag_$name").cast("double") /
          greatest(lit(1L), col(s"__n_$name")), 6).as("u"))
    }.reduce(_ unionByName _)
  }

  /** One Fellegi–Sunter EM iteration (the Splink/RecordLinkage training
    * loop, Dempster–Laird–Rubin EM on the latent match indicator):
    * given candidate pairs with per-field agreement BOOLEANs, the
    * current per-field (m, u) and match prior `lambda`, the E-step
    * scores each pair's posterior match probability
    * `w = λ·Π_f t_m(f) / (λ·Π_f t_m(f) + (1−λ)·Π_f t_u(f))` with
    * `t_m = m` on agreement, `1−m` on disagreement, `1` on NULL (a
    * missing comparison carries no evidence — the [[linkageWeights]]
    * convention), and the M-step re-estimates
    * `m' = Σ w·[agree] / Σ w·[non-null]`,
    * `u' = Σ (1−w)·[agree] / Σ (1−w)·[non-null]`, `λ' = Σ w / n`.
    *
    * Exactness: the factors are driver literals, the products are
    * written in `fields` order (left-associated IEEE — engine-
    * portable), `w` and `1−w` are rounded 6 dp and every M-step sum
    * rides DECIMAL, so the whole iteration replays as oracle CTEs;
    * iterate-to-convergence chains calls with each round's 6-dp
    * outputs (the CTE-replayed-iterations discipline). One projection
    * + one agg over the pairs; at 100 TB the pairs come from a
    * budget-gated candidate stage ([[blockedPairs]] / [[fuzzyPairs]]).
    * Returns one row per field: (field, m_new, u_new, lambda_new).
    */
  def emIteration(pairs: DataFrame,
      fields: Seq[(String, Double, Double)], lambda: Double): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    fields.foreach { case (c, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"m and u must be in (0,1) for $c, got m=$m u=$u")
    }
    val pm = fields.map { case (c, m, _) =>
      when(col(c).isNull, lit(1.0)).when(col(c), lit(m)).otherwise(lit(1.0 - m))
    }.reduce(_ * _)
    val pu = fields.map { case (c, _, u) =>
      when(col(c).isNull, lit(1.0)).when(col(c), lit(u)).otherwise(lit(1.0 - u))
    }.reduce(_ * _)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val scored = Parallelism.ensureCompute(pairs)
      .withColumn("__w", round(
        lit(lambda) * pm / (lit(lambda) * pm + lit(1.0 - lambda) * pu), 6))
      .withColumn("__v", round(lit(1.0) - col("__w"), 6))
    val aggs = fields.flatMap { case (c, _, _) =>
      Seq(
        sum(when(col(c).isNotNull, col("__w").cast(dec))).as(s"__wn_$c"),
        sum(when(col(c), col("__w").cast(dec))).as(s"__wa_$c"),
        sum(when(col(c).isNotNull, col("__v").cast(dec))).as(s"__vn_$c"),
        sum(when(col(c), col("__v").cast(dec))).as(s"__va_$c"))
    } ++ Seq(sum(col("__w").cast(dec)).as("__wsum"), count(lit(1)).as("__n"))
    val one = scored.agg(aggs.head, aggs.tail: _*)
    // ONE evaluation of the heavy candidate scan: every per-field
    // readout is a struct over the SAME single-row aggregate, exploded
    // in `fields` order. A union of per-field selects would let column
    // pruning specialize the Aggregate per branch, defeating exchange
    // reuse and re-running the blocked join + edit-distance once per
    // field.
    one.select(explode(array(fields.map { case (c, _, _) =>
      struct(lit(c).as("field"),
        round(col(s"__wa_$c").cast("double") /
          col(s"__wn_$c").cast("double"), 6).as("m_new"),
        round(col(s"__va_$c").cast("double") /
          col(s"__vn_$c").cast("double"), 6).as("u_new"),
        round(col("__wsum").cast("double") / col("__n"), 6).as("lambda_new"))
    }: _*)).as("__r")).select("__r.*")
  }

  /** The driver-side per-field weight constants [[linkageWeights]]
    * splices, exposed so an oracle (or a reviewer) reads the SAME
    * literals — the shared-literal discipline.
    */
  def linkageConstants(fields: Seq[(String, Double, Double)])
      : Seq[(String, String, String)] =
    fields.map { case (c, m, u) =>
      (c,
        BigDecimal(math.log(m / u) / math.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString,
        BigDecimal(math.log((1 - m) / (1 - u)) / math.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString)
    }

  /** PAIR-MASS TELEMETRY: the planned candidate-pair count per blocking
    * pass, from the SAME counts-only partial agg the block cap runs —
    * `Σ bs·(bs−1)/2` over kept blocks plus what the cap drops. Blocked
    * joins are pair-mass-proportional (time follows Σ bs², not rows),
    * so a corpus whose hot block keys multiply makes a 10× input cost
    * 100× SILENTLY unless the mass is surfaced; this report makes the
    * blowup visible at plan time, before the expensive verify runs.
    * When a pass drops mass, the recall fix is a FINER second blocker
    * (e.g. mask fewer characters, or append a length bucket) — the cap
    * keeps cost bounded, extra passes restore the lost pairs.
    * One row per pass: `(pass, blocks, blocks_dropped, pairs_planned,
    * pairs_dropped)`; products ride DECIMAL(38,0) (a near-2³¹ block's
    * bs·(bs−1) passes 2⁶³ in LongType).
    */
  def pairMassReport(df: DataFrame, idCol: String, strCol: String,
      blockers: Seq[Column => Column], maxBlockSize: Int = 10000): DataFrame = {
    require(blockers.nonEmpty, "at least one blocking pass required")
    val base = Parallelism.ensureCompute(df)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    blockers.zipWithIndex.map { case (blocker, i) =>
      massReport(base.select(blocker(col("s")).as("bk")), maxBlockSize, i)
    }.reduce(_ unionByName _)
  }

  /** [[pairMassReport]] for ONE arbitrary pre-computed block-key column
    * — the pricing surface for [[blockedPairs]]-style callers whose key
    * is not a function of a single string column.
    */
  def pairMassReportKeyed(df: DataFrame, blockKey: Column,
      maxBlockSize: Int = 10000): DataFrame =
    massReport(Parallelism.ensureCompute(df).select(blockKey.as("bk")),
      maxBlockSize, 0)

  private def massReport(keyed: DataFrame, maxBlockSize: Int,
      pass: Int): DataFrame = {
    val mass = (col("bs").cast("decimal(38,0)") * (col("bs") - 1L) /
      lit(2)).cast("decimal(38,0)")
    keyed
      // a NULL block key can never pair (equi-joins don't match NULLs),
      // so it must not count as pair mass — a corpus of mostly-missing
      // keys would otherwise price as one giant phantom block and trip
      // the budget on work the join would never do
      .where(col("bk").isNotNull)
      .groupBy(col("bk")).agg(count(lit(1)).as("bs"))
      .agg(
        count(lit(1)).as("blocks"),
        sum(when(col("bs") > maxBlockSize, 1L).otherwise(0L)).as("blocks_dropped"),
        coalesce(sum(when(col("bs") <= maxBlockSize, mass)),
          lit(0).cast("decimal(38,0)")).cast("decimal(38,0)").as("pairs_planned"),
        coalesce(sum(when(col("bs") > maxBlockSize, mass)),
          lit(0).cast("decimal(38,0)")).cast("decimal(38,0)").as("pairs_dropped"))
      .select(lit(pass).cast("long").as("pass"), col("blocks"),
        col("blocks_dropped"), col("pairs_planned"), col("pairs_dropped"))
  }

  /** Budget-gated GENERIC blocked self-join: candidate pairs by
    * co-membership in `blockKey`'s block, every payload column of `df`
    * carried with `a_` / `b_` prefixes and `a_<idCol> < b_<idCol>` —
    * the candidate stage for callers that score pairs themselves (e.g.
    * [[linkageWeights]], whose pair input otherwise bypasses every
    * fail-fast this file builds). Same contract as [[fuzzyPairs]]:
    * oversized blocks are dropped whole (`maxBlockSize`, so a
    * degenerate key cannot go quadratic), and `pairBudget` prices the
    * planned mass from a counts-only agg ([[pairMassReportKeyed]]) and
    * REFUSES over-budget before a single pair materializes. Blocked
    * joins cost pair mass, not rows — the q126/q191 lesson priced at
    * plan time.
    */
  def blockedPairs(df: DataFrame, idCol: String, blockKey: Column,
      maxBlockSize: Int = 10000, pairBudget: Option[Long] = None): DataFrame = {
    val base = Parallelism.ensureCompute(df)
    pairBudget.foreach { budget =>
      val r = pairMassReportKeyed(base, blockKey, maxBlockSize).collect()(0)
      System.err.println(s"[graft] blockedPairs: ${r.getLong(1)} blocks " +
        s"(${r.getLong(2)} dropped by cap $maxBlockSize), " +
        s"pairs planned ${r.getDecimal(3)}, dropped ${r.getDecimal(4)}")
      require(BigDecimal(r.getDecimal(3)) <= BigDecimal(budget),
        s"planned candidate-pair mass ${r.getDecimal(3)} exceeds pairBudget " +
          s"$budget (cap $maxBlockSize kept it from the unbounded case); " +
          "use a finer blocking key or raise the budget")
    }
    val keyed = base.withColumn("__bk", blockKey)
    val okKeys = keyed.groupBy(col("__bk")).agg(count(lit(1)).as("bs"))
      .where(col("bs") <= maxBlockSize)
      .select(col("__bk"))
    val capped = keyed.join(okKeys, Seq("__bk"), "left_semi")
    val a = capped.select(col("__bk") +:
      df.columns.toIndexedSeq.map(c => col(c).as(s"a_$c")): _*)
    val b = capped.select(col("__bk") +:
      df.columns.toIndexedSeq.map(c => col(c).as(s"b_$c")): _*)
    a.join(b, Seq("__bk"))
      .where(col(s"a_$idCol") < col(s"b_$idCol"))
      .drop("__bk")
  }

  /** Candidate pairs `(id_a, id_b, dist)` with `id_a < id_b` and
    * `levenshtein <= maxDist`, proposed by co-membership in any
    * blocking pass. `blockers` map the string column to a block key
    * (e.g. mask trailing characters, phonetic code, length bucket).
    *
    * `pairBudget`, when set, prices the join before running it: the
    * per-pass [[pairMassReport]] is computed (one counts-only agg per
    * pass, key-table-sized), logged, and the job FAILS FAST if the
    * total planned mass exceeds the budget — the q126 lesson: blocked
    * joins cost pair mass, not rows, and a silent 100× is worse than
    * an explicit refusal naming the mass and the cure (finer blockers).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      blockers: Seq[Column => Column], maxDist: Int,
      maxBlockSize: Int = 10000, pairBudget: Option[Long] = None): DataFrame = {
    require(blockers.nonEmpty, "at least one blocking pass required")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    pairBudget.foreach { budget =>
      val rows = pairMassReport(df, idCol, strCol, blockers, maxBlockSize)
        .collect() // bounded: one row per blocking pass
      rows.foreach { r =>
        System.err.println(s"[graft] fuzzyPairs pass ${r.getLong(0)}: " +
          s"${r.getLong(1)} blocks (${r.getLong(2)} dropped by cap $maxBlockSize), " +
          s"pairs planned ${r.getDecimal(3)}, dropped ${r.getDecimal(4)}")
      }
      val planned = rows.map(r => BigDecimal(r.getDecimal(3))).sum
      require(planned <= BigDecimal(budget),
        s"planned candidate-pair mass $planned exceeds pairBudget $budget " +
          s"(cap $maxBlockSize kept it from the unbounded case); use finer " +
          "blocking keys or raise the budget")
    }
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
