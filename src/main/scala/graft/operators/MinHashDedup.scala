package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection over a text column — the
  * shingle → minhash → band → bucket-join pipeline used for web-scale
  * corpus dedup (north-star operator; no analog in the reference, which
  * only does exact dedup at `etl.py:50`).
  *
  * Scale design:
  *  - signatures are computed in ONE codegen'd projection (nested
  *    `transform` over literal coefficient arrays — no UDF, no explode of
  *    the shingle set, no k passes);
  *  - candidate generation explodes only `bands` rows per doc (not
  *    shingles), then self-joins on the 8-byte bucket key;
  *  - oversized buckets (degenerate/boilerplate content) are capped by
  *    `maxBucketSize` to bound the quadratic pair blowup — the standard
  *    guard at 100 TB where a single viral boilerplate would otherwise
  *    produce 10^12 pairs;
  *  - candidate pairs are verified against true shingle-set Jaccard before
  *    any doc is dropped (LSH is a filter, not an oracle);
  *  - duplicate groups are closed transitively with alternating
  *    small-star/large-star label propagation (bounded iterations, each a
  *    partial-aggregatable min-reduce — the published CC-in-MapReduce
  *    recipe), so chains A~B~C collapse to one survivor.
  */
object MinHashDedup {

  /** @param jaccardThreshold  true-Jaccard threshold for a verified dup pair
    * @param numHashes         minhash permutations (bands * rowsPerBand)
    * @param bands             LSH bands; P(candidate) = 1-(1-s^r)^b
    * @param shingleN          word-shingle width
    * @param maxBucketSize     drop buckets larger than this (boilerplate guard)
    */
  final case class Config(
      jaccardThreshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      maxBucketSize: Int = 1000,
      seed: Long = 42L) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** 31-bit Mersenne prime hash space: with a, b, h < 2^31 the products in
    * `a*h + b` stay below 2^63, so the permutation arithmetic cannot trip
    * ANSI-mode overflow (Spark 4 default). 2^31 minima are ample for
    * corpus-scale shingle sets.
    */
  private val MersennePrime = (1L << 31) - 1

  /** Deterministic (a, b) permutation coefficients from the seed. */
  private def coefficients(cfg: Config): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(cfg.seed)
    val as = Seq.fill(cfg.numHashes)((math.abs(rnd.nextLong()) % (MersennePrime - 1)) + 1)
    val bs = Seq.fill(cfg.numHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    (as, bs)
  }

  /** id, shingles, sig (array<long> of numHashes minima). Docs with no
    * shingle (shorter than shingleN tokens) get an empty sig and are never
    * candidates.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val (as, bs) = coefficients(cfg)
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    val sh = TextFunctions.shingles(col(textCol), cfg.shingleN)
    // 64-bit base hash per shingle, masked positive so the modular
    // arithmetic below stays in [0, 2^61).
    val shingleHashes = transform(sh, s => pmod(xxhash64(s), lit(MersennePrime)))
    val sig = when(size(sh) === 0, array().cast("array<bigint>"))
      .otherwise(
        zip_with(aArr, bArr, (a, b) =>
          array_min(transform(shingleHashes, h => pmod(a * h + b, lit(MersennePrime))))))
    df.select(col(idCol).as("id"), sh.as("shingles"), sig.as("sig"))
  }

  /** (band, bucket, id) rows — `bands` per doc. Bucket key hashes the
    * band's signature slice.
    */
  def bandBuckets(sigs: DataFrame, cfg: Config): DataFrame = {
    val bandIdx = sequence(lit(0), lit(cfg.bands - 1))
    sigs.where(size(col("sig")) > 0)
      .select(col("id"),
        explode(transform(bandIdx, b =>
          struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * cfg.rowsPerBand + 1, lit(cfg.rowsPerBand)))
              .as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Distinct candidate pairs (idA < idB) sharing any band bucket, with
    * oversized buckets dropped.
    */
  def candidatePairs(sigs: DataFrame, cfg: Config): DataFrame = {
    val buckets = bandBuckets(sigs, cfg)
    val sized = buckets
      .withColumn("bs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .where(col("bs") <= cfg.maxBucketSize)
      .drop("bs")
    val l = sized.select(col("band"), col("bucket"), col("id").as("idA"))
    val r = sized.select(col("band"), col("bucket"), col("id").as("idB"))
    l.join(r, Seq("band", "bucket"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB")
      .distinct()
  }

  /** Candidate pairs verified by true shingle Jaccard >= threshold. */
  def verifiedPairs(df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val sigs = signatures(df, idCol, textCol, cfg).cache()
    val cands = candidatePairs(sigs, cfg)
    val shA = sigs.select(col("id").as("idA"), col("shingles").as("shA"))
    val shB = sigs.select(col("id").as("idB"), col("shingles").as("shB"))
    cands.join(shA, "idA").join(shB, "idB")
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select("idA", "idB", "jaccard")
  }

  /** Transitive closure of dup pairs -> (id, rep) where rep = min id of the
    * connected component. Iterative min-label propagation; each step is a
    * groupBy-min (partial agg), bounded by `maxIterations` with early stop.
    */
  def duplicateGroups(pairs: DataFrame, maxIterations: Int = 15): DataFrame = {
    // undirected edge list, both directions
    val fwd = pairs.select(col("idA").as("src"), col("idB").as("dst"))
    val edges = fwd.union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .distinct().cache()
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("rep"))
      .cache()
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // rep(id) <- min(rep(id), min over neighbors of rep(neighbor))
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("rep")).as("nrep"))
      val next = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("rep", "prev"), "id")
        .where(col("rep") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Near-dedup: drop every doc whose component representative is a smaller
    * id; docs in no dup pair survive untouched.
    */
  def dedup(df: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val groups = duplicateGroups(verifiedPairs(df, idCol, textCol, cfg))
    val losers = groups.where(col("rep") =!= col("id")).select(col("id").as("__loser"))
    // no broadcast hint: loser set size is data-dependent (could be most of
    // the corpus); AQE picks broadcast when it fits.
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }
}
