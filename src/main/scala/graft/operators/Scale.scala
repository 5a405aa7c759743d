package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale mechanics: skew-tolerant aggregation and bucketed co-located
  * joins. These are the knobs a 100 TB deployment turns when AQE's generic
  * handling isn't enough.
  */
object Scale {

  /** Two-phase salted aggregation for heavy-hitter group keys.
    *
    * A plain `groupBy(keys).agg(sum)` sends every row of a hot key to ONE
    * reducer; with a 10^9-row key that reducer is the job. Salting splits
    * each key into `saltBuckets` sub-groups for the first (partial) shuffle
    * and re-aggregates the partials in a second, tiny shuffle. Only
    * algebraic aggregates (sum/count/min/max) can be composed this way —
    * the API takes the per-phase columns explicitly.
    *
    * (Map-side combine already handles mild skew; salting matters when a
    * key's cardinality exceeds what one task should hold, e.g. top-1
    * event_type at 100 TB.)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      phase1: Seq[Column],   // e.g. sum("v").as("s"), count(lit(1)).as("n")
      phase2: Seq[Column]    // e.g. sum("s").as("s"), sum("n").as("n")
  ): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partials = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    partials
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Salted join for heavy-hitter JOIN keys: fact rows of a hot key are
    * spread over `saltBuckets` sub-keys (deterministically, by hashing a
    * unique fact column) while the dim side replicates each of its rows
    * into every bucket — the join runs on (key, salt), so no single task
    * owns a hot key's full row set.
    *
    * AQE's skew-join split is the first line of defense (it stays on);
    * this manual lever covers what AQE cannot: skew that only materializes
    * AFTER the exchange (stateful downstream ops keyed on the join key),
    * deterministic layouts where re-planning is off, and streaming joins
    * where AQE does not apply. Cost: dim side grows `saltBuckets`x — use
    * for dimension-sized right sides only.
    *
    * Inner/left joins only: under dim replication an unmatched dim row
    * would surface once per salt replica, so right/full semantics cannot
    * be preserved — fail fast rather than silently multiply.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, factUniqueCol: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin preserves inner/left semantics only, got '$joinType'")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(col(factUniqueCol)), lit(saltBuckets)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed+sorted by the join key so subsequent joins
    * are exchange-free (co-located, zipper-merge). This is the batch-layer
    * answer to "this join runs every day on the same keys": pay the shuffle
    * once at write time, never again at read time.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    require(!table.contains("."),
      "writeBucketed takes an unqualified table name in the current database")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A crashed prior run can leave the managed location on disk while the
    // in-memory catalog has forgotten the table; saveAsTable then fails
    // with LOCATION_ALREADY_EXISTS, so clear the orphan directory first.
    // The location is resolved through the session catalog (not assumed to
    // be <warehouse>/<table>) so a non-default current database can never
    // alias another database's directory.
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      table, Some(spark.catalog.currentDatabase))
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket columns. With matching
    * bucket specs Spark plans a SortMergeJoin with NO Exchange on either
    * side (verify via `planHasExchange`).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      joinCols: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), joinCols)

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the assertion hook for co-location tests.
    */
  def planHasExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }

  /** KMV (k-minimum-values / theta-sketch) UNION and INTERSECTION
    * cardinality estimates for two key sets (Beyer et al. 2007; the
    * Apache DataSketches theta formulation) — the "should this join side
    * broadcast, and how selective is the join" planning probe: each side
    * reduces to an O(k) mergeable sketch ([[graft.plans.SketchAggregates
    * .bottom_k]], one partial-agg pass, no shuffle of the key column),
    * and BOTH estimates fall out of the merged sketch:
    *
    *   θ        = k-th smallest md5 of the union, as a unit fraction
    *   est(∪)  = (k−1)/θ
    *   ρ        = fraction of the union sketch present in both sides
    *   est(∩)  = ρ · est(∪)
    *
    * Requires the UNION to hold at least k distinct keys (below that the
    * sets are small enough to count exactly — this throws rather than
    * silently degrade). Everything downstream of the two aggregates runs
    * on 1-row frames (bounded); md5 arithmetic is portable, so an oracle
    * replays θ, ρ and both estimates digit-for-digit. Exact counts ride
    * along for the accuracy readout (±1/√k relative error at 95%).
    */
  def kmvOverlapEstimate(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    import graft.plans.SketchAggregates.bottom_k
    def sketch(df: DataFrame, key: String, out: String): DataFrame =
      Parallelism.ensureCompute(df)
        .select(col(key).cast("string").as("v"))
        .agg(bottom_k(col("v"), k).as("vals"))
        .select(transform(col("vals"), v => md5(v)).as(out))
    val hA = sketch(a, aKey, "ha")
    val hB = sketch(b, bKey, "hb")
    val exacts = a.select(col(aKey).cast("string").as("v"))
      .withColumn("ia", lit(1)).unionByName(
        b.select(col(bKey).cast("string").as("v")).withColumn("ia", lit(0)))
      .groupBy(col("v")).agg(max(col("ia")).as("maxIa"), min(col("ia")).as("minIa"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("maxIa") === 1 && col("minIa") === 0, 1L).otherwise(0L))
          .as("exact_intersection"))
    // 48-bit hex prefix -> integer, the portable q13e-style fold
    def hex48(h: Column): Column =
      aggregate(filter(split(substring(h, 1, 12), ""), c => c =!= ""),
        lit(0L), (acc, c) => acc * 16L + (instr(lit("0123456789abcdef"), c) - 1L))
    val union = slice(array_sort(array_distinct(concat(col("ha"), col("hb")))), 1, k)
    hA.crossJoin(hB).crossJoin(exacts)
      .select(lit(k).as("k"),
        when(size(union) >= k, union).otherwise(raise_error(lit(
          s"kmvOverlapEstimate: union holds fewer than k=$k distinct keys — " +
            "count exactly instead"))).as("uk"),
        col("ha"), col("hb"), col("exact_union"), col("exact_intersection"))
      .withColumn("rho", size(filter(col("uk"), h =>
        array_contains(col("ha"), h) && array_contains(col("hb"), h))).cast("long"))
      .withColumn("theta48", hex48(element_at(col("uk"), k)))
      .withColumn("est_union",
        round(lit((k - 1).toDouble) * 281474976710656.0 /
          col("theta48").cast("double"), 4))
      .withColumn("est_intersection",
        round(col("rho").cast("double") * (lit((k - 1).toDouble) * 281474976710656.0 /
          col("theta48").cast("double")) / k, 4))
      .select(col("k"), col("rho"), col("theta48"), col("est_union"),
        col("est_intersection"), col("exact_union"), col("exact_intersection"))
  }

  /** KEY-SKEW DIAGNOSIS report — the "should this key be salted /
    * AQE-skew-joined" readout BEFORE a 100 TB shuffle spills on it:
    * one row of `(n_rows, n_keys, max_share, top10_share, gini)` for a
    * prospective shuffle key. Gini ∈ [0, 1): 0 = perfectly uniform
    * keys, →1 = one key owns everything; `max_share` is the single
    * hottest key's row fraction (the straggler-task bound under hash
    * partitioning). Pairs with [[saltedAgg]]/[[saltedJoin]] (the cure)
    * and AQE skew handling the way [[kmvOverlapEstimate]] pairs with
    * broadcast planning.
    *
    * Exact Gini without a global sort: key counts ascending form the
    * Lorenz axis; `G = (2·Σ i·cᵢ − (K+1)·Σc) / (K·Σc)` with i the
    * ascending rank. Tied counts make per-row ranks ill-defined, so the
    * fold runs over the DISTINCT-COUNT-VALUE table instead (the q181
    * midrank block identity): a block of `k_c` keys sharing count `c`
    * after `cb` smaller keys contributes
    * `2·Σ i·c = c·k_c·(2·cb + k_c + 1)` — exact integers, rank-order
    * invariant. One range-partitioned prefix sum over that tiny table
    * ([[graft.operators.TrainingPrep.globalPrefixSum]] on the UNIQUE
    * count value), DECIMAL(38,0) accumulators past 2⁶³; top-shares from
    * one TakeOrdered(10).
    *
    * Scale shape: one key partial-agg shuffle (key-table-sized after
    * map-side combine), one prefix sum over the key table, one
    * 10-row collect. One row out; `gini`/shares rounded 6 dp.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .select(col("c"))
    val byVal = counts.groupBy(col("c")).agg(count(lit(1)).as("kc"))
    val cum = graft.operators.TrainingPrep
      .globalPrefixSum(byVal, "c", "kc", "cumk")
    val top = counts.orderBy(col("c").desc).limit(10)
      .collect().map(_.getLong(0))
    val agg = cum.agg(
      // widen BEFORE multiplying: c·kc·(2·cumBefore+kc+1) in LongType
      // wraps past 2^63 on ~1e10-key tables; the decimal cast must hit
      // an operand, not the already-overflowed product
      sum(col("c").cast("decimal(38,0)") * col("kc"))
        .cast("decimal(38,0)").as("tot"),
      sum(col("kc")).as("k"),
      sum(col("c").cast("decimal(38,0)") * col("kc") *
        (lit(2L) * (col("cumk") - col("kc")) + col("kc") + 1L))
        .cast("decimal(38,0)").as("two_sic"))
    agg.select(
      col("tot").cast("long").as("n_rows"),
      col("k").as("n_keys"),
      round(lit(top.headOption.getOrElse(0L)).cast("double") /
        col("tot").cast("double"), 6).as("max_share"),
      round(lit(top.sum).cast("double") / col("tot").cast("double"), 6)
        .as("top10_share"),
      round((col("two_sic").cast("double") -
        (col("k") + 1L).cast("double") * col("tot").cast("double")) /
        (col("k").cast("double") * col("tot").cast("double")), 6).as("gini"))
  }
}
