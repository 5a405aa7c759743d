package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a TABLE: `depth`
  * pairwise-independent hash rows of `width` counters, materialized as at
  * most depth·width (d, bucket, cnt) rows. The frequency-estimation
  * sibling of the HLL/heavy-hitter sketches already in
  * [[graft.plans.SketchAggregates]] — but built from PORTABLE arithmetic
  * (`((a_d·k + b_d) mod P) mod width`, P = 2³¹−1 Mersenne), so an oracle
  * replays every counter and every estimate bit-for-bit, which the
  * binary-blob `count_min_sketch()` builtin cannot.
  *
  * Estimates are upper bounds: `est(k) = min_d cnt[d][h_d(k)] ≥ true(k)`,
  * within `ε·N` of truth with probability 1−δ at width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Scale shape: the build is one explode(depth) + one partial-agg shuffle
  * keyed by (d, bucket) — map-side combine collapses each partition to at
  * most depth·width rows regardless of input size, so the shuffle carries
  * sketch-sized data, not input-sized. The probe side joins the (tiny,
  * ≤ depth·width rows) sketch BROADCAST against the probe keys — no
  * driver state at any input size. Sketches for different shards/days
  * union-and-re-aggregate into one (counters are additive), the property
  * that makes CMS the streaming/incremental frequency monitor.
  */
object CountMin {

  /** 2³¹ − 1 (Mersenne): mod-P products of two < P values stay < 2⁶²,
    * inside BIGINT on both engines — the portability contract.
    */
  val P: Long = 2147483647L

  private def hashA(d: Int): Long = (1103515245L * (d + 1) + 12345L) % P
  private def hashB(d: Int): Long = (2654435761L * (d + 1) + 1013904223L) % P

  /** Bucket of `key` under hash row `d` — pure column arithmetic, exact
    * BIGINT, replayable as the same expression in any SQL engine.
    */
  def bucket(key: Column, d: Int, width: Int): Column =
    (((key % P + P) % P) * hashA(d) + hashB(d)) % P % width

  /** Build the sketch over `df[keyCol]` (BIGINT keys): one row per
    * non-empty (d, bucket) counter.
    */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val buckets = (0 until depth).map(d => bucket(col(keyCol), d, width))
    Parallelism.ensureCompute(df)
      .select(posexplode(array(buckets: _*)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge shard/day sketches built with the SAME (depth, width): counters
    * add. This is the incremental-maintenance path — yesterday's sketch
    * plus today's delta equals the full rebuild bit-for-bit, with history
    * never rescanned (the sketch analog of the q91 incremental-agg /
    * q106 incremental-minhash discipline).
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Sketch-based equi-join CARDINALITY estimate (the AMS/CM
    * inner-product identity, Cormode & Muthukrishnan 2005 §4.2):
    * `|A ⋈_k B| ≤ min_d Σ_w cntA[d][w]·cntB[d][w]`, an upper bound
    * within `ε·|A|·|B|` of truth at width = ⌈e/ε⌉. This is what a
    * planner consults before committing to a shuffle strategy at
    * 100 TB: both sides reduce to ≤ depth·width counters (one
    * sketch-sized partial-agg shuffle each — map-side combine caps every
    * partition's contribution), the dot product is a join of two tiny
    * tables, and the estimate never touches a row of the actual join.
    * Returns one row (depth, width, est, exact_hint_rows) where
    * `exact_hint_rows` is NULL unless `withExact` (the verification
    * mode, which runs the real join to expose the estimation gap).
    */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int, width: Int, withExact: Boolean = false): DataFrame = {
    val cmA = build(a.where(col(aKey).isNotNull), aKey, depth, width)
    val cmB = build(b.where(col(bKey).isNotNull), bKey, depth, width)
    // a depth whose sketches share NO bucket has dot product exactly 0
    // (the join is provably empty) — it must participate in the min as
    // 0, not drop out: right-join every depth in and coalesce, so
    // disjoint key sets report est = 0 instead of NULL/phantom mass
    val spark = a.sparkSession
    val depths = spark.range(depth).select(col("id").cast("int").as("d"))
    // per-bucket products approach (n/width)^2 at planner scale (~1e15
    // each at 1e10-row sides) and their sum can pass 2^63 — widen one
    // operand to DECIMAL(38,0) before the multiply; the released BIGINT
    // hint saturates at Long.MaxValue rather than wrapping
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val est = cmA.join(cmB.withColumnRenamed("cnt", "cntb"), Seq("d", "bucket"))
      .groupBy(col("d"))
      .agg(sum(col("cnt").cast(dec38) * col("cntb")).as("dp"))
      .join(depths, Seq("d"), "right")
      .agg(min(coalesce(col("dp"), lit(0L).cast(dec38))).as("estd"))
      .select(least(col("estd"), lit(Long.MaxValue).cast(dec38))
        .cast("long").as("est"))
    val withMeta = est.select(lit(depth).as("depth"), lit(width).as("width"),
      col("est"))
    if (!withExact) withMeta.withColumn("exact_rows", lit(null).cast("long"))
    else {
      val exact = a.where(col(aKey).isNotNull).select(col(aKey).as("__k"))
        .join(b.where(col(bKey).isNotNull).select(col(bKey).as("__k")), Seq("__k"))
        .agg(count(lit(1)).as("exact_rows"))
      withMeta.crossJoin(exact)
    }
  }

  /** Point-query the sketch for every distinct key of `probes[keyCol]`:
    * `est = min_d cnt[d][h_d(key)]` (an untouched counter reads 0). The
    * sketch side is broadcast — it is ≤ depth·width rows by construction.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val keys = probes.select(col(keyCol).as("key")).distinct()
    val expanded = keys.select(col("key"),
      posexplode(array((0 until depth).map(d => bucket(col("key"), d, width)): _*))
        .as(Seq("d", "bucket")))
    expanded.join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
