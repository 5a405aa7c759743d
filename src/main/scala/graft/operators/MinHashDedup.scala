package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  *  - NOTHING carrying a shingle array is ever broadcast: only the bare
  *    (idA, idB) candidate-pair keys travel to every task; the shingle
  *    table stays on the probe side of both verify joins and the final
  *    pair-up is a pinned shuffle join on the pair key;
  *  - duplicate groups are closed transitively with alternating
  *    small-star/large-star label propagation (bounded iterations, each a
  *    partial-aggregatable min-reduce — the published CC-in-MapReduce
  *    recipe), so chains A~B~C collapse to one survivor.
  *
  * Cache lifecycle: the shingle table (the only big intermediate) is
  * persisted for the duration of the verify step and unpersisted as soon as
  * the (tiny, result-sized) verified-pair set is materialized — nothing
  * input-sized stays pinned in executor memory after a call returns.
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
  private def coefficients(cfg: Config): (Seq[Long], Seq[Long]) =
    portableCoefficients(cfg.numHashes, cfg.seed)

  /** (id, shingles) with shingles pre-hashed to 64-bit longs (see
    * [[TextFunctions.hashedShingles]]) — computed once per pipeline; the
    * parallelism guard spreads the shingle construction even off a
    * single-row-group scan. Everything downstream (signature permutations,
    * Jaccard verification) consumes the hashes: set cardinalities are
    * preserved w.h.p., and the verify joins carry compact long arrays
    * instead of n-word strings.
    */
  private[graft] def shingleTable(df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame =
    Parallelism.ensureCompute(df).select(col(idCol).as("id"),
      TextFunctions.hashedShingles(col(textCol), cfg.shingleN).as("shingles"))

  /** (id, sig) for every doc with >= 1 shingle; empty-shingle docs get an
    * empty sig.
    *
    * Shape matters here. The shingles arrive pre-hashed (xxhash64 longs), so
    * the per-permutation work is pure long arithmetic — a row-local
    * `array_min(transform(...))` per permutation, no explode, no shuffle of
    * exploded rows, no 64-column hash agg, no join-back (measured 2.5-5x
    * faster than the explode+agg shape it replaces). Two guardrails:
    *  - the Mersenne reduction `pmod(h, p)` is projected to `__hm` BELOW a
    *    `repartition(id)` Exchange — the barrier stops CollapseProject from
    *    re-inlining the shingle construction (and the reduction) into all
    *    `numHashes` lambdas, the measured-70s blowup;
    *  - the repartition also spreads per-doc sig compute across the cluster
    *    even off a single-row-group scan, and downstream joins on `id`
    *    reuse the partitioning.
    * Values are identical to pmod(xxhash64(shingle_string) * a + b, p) of
    * the explode+agg shape — permutation math unchanged.
    */
  private def sigTable(base: DataFrame, cfg: Config): DataFrame = {
    val (as, bs) = coefficients(cfg)
    base
      .select(col("id"),
        transform(col("shingles"), h => pmod(h, lit(MersennePrime))).as("__hm"))
      .repartition(col("id"))
      .select(col("id"),
        graft.plans.PolyHashExpressions
          .minhashSignature(col("__hm"), as, bs, MersennePrime).as("sig"))
  }

  /** Map-only signature projection over an ALREADY-persisted shingle
    * table. Scanning the InMemoryRelation is itself the CollapseProject
    * barrier that [[sigTable]]'s `repartition(id)` provides on the lazy
    * path (a cache scan cannot be inlined into the permutation lambdas),
    * so on the eager pipelines the repartition Exchange and the id
    * join-back of [[signatures]] are pure overhead: this computes every
    * permutation minimum in one pass over the cache — zero shuffles of
    * the corpus where the lazy shape pays two.
    */
  private def sigsFromCached(base: DataFrame, as: Seq[Long], bs: Seq[Long]): DataFrame =
    base.select(col("id"),
      graft.plans.PolyHashExpressions.minhashSignature(
        transform(col("shingles"), h => pmod(h, lit(MersennePrime))),
        as, bs, MersennePrime).as("sig"))

  /** id, shingles, sig (array<long> of numHashes minima). Docs with no
    * shingle (shorter than shingleN tokens) get an empty sig and are never
    * candidates.
    *
    * The shingle-carrying side is NEVER broadcast (its array payloads are
    * both huge and badly size-estimated); the join is pinned shuffle-hash,
    * which at any scale is one id-shuffle of each side.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val base = shingleTable(df, idCol, textCol, cfg)
    base.join(sigTable(base, cfg).hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("shingles"),
        coalesce(col("sig"), array().cast("array<bigint>")).as("sig"))
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

  /** Shared tail of LSH candidate generation: cap oversized buckets
    * (boilerplate guard), self-join on (band, bucket), orient and dedup
    * pairs. Both the xxhash64 and portable pipelines route through here so
    * cap/join discipline can never drift between them.
    */
  private def capAndPair(buckets: DataFrame, maxBucketSize: Int): DataFrame = {
    // Oversized buckets are, by the boilerplate guard's own premise, RARE —
    // so compute them with a partial-aggregatable count and anti-join them
    // away instead of window-counting every bucket row (which shuffles AND
    // sorts the full bucket table). The anti-join and the pair self-join
    // key on the same (band, bucket), so the one shuffle is reused; AQE
    // broadcasts the (near-empty) oversized set when it fits.
    val oversized = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bs"))
      .where(col("bs") > maxBucketSize)
      .select("band", "bucket")
    val sized = buckets.join(oversized, Seq("band", "bucket"), "left_anti")
    val l = sized.select(col("band"), col("bucket"), col("id").as("idA"))
    val r = sized.select(col("band"), col("bucket"), col("id").as("idB"))
    l.join(r, Seq("band", "bucket"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB")
      .distinct()
  }

  /** Distinct candidate pairs (idA < idB) sharing any band bucket, with
    * oversized buckets dropped.
    */
  def candidatePairs(sigs: DataFrame, cfg: Config): DataFrame =
    capAndPair(bandBuckets(sigs, cfg), cfg.maxBucketSize)

  /** PAIR-MASS TELEMETRY for the LSH bucket join — the
    * [[EntityResolution.pairMassReport]] discipline on this operator's
    * own candidate generator: per band, bucket counts and the planned /
    * cap-dropped candidate-pair mass `Σ bs·(bs−1)/2` from the SAME
    * counts-only agg the cap runs. Blocked joins cost pair mass, not
    * rows; this prices an LSH run (and exposes a boilerplate-heavy
    * corpus) BEFORE signatures ever verify. One row per band:
    * `(band, buckets, buckets_dropped, pairs_planned, pairs_dropped)`,
    * mass in DECIMAL(38,0).
    */
  def bucketMassReport(sigs: DataFrame, cfg: Config): DataFrame =
    bucketMassOf(bandBuckets(sigs, cfg), cfg.maxBucketSize)

  /** [[bucketMassReport]] on the PORTABLE hash space, so an oracle
    * replays the priced mass itself (signatures, band folds, bucket
    * sizes and the Σ bs·(bs−1)/2 arithmetic are all 48-bit integer
    * folds — the q13f chain priced instead of joined).
    */
  def portableBucketMassReport(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 16, bands: Int = 8,
      shingleN: Int = 3, maxBucketSize: Int = 1000,
      seed: Long = 7L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    bucketMassOf(
      portableBandBuckets(
        portableSignatures(docs, idCol, textCol, numHashes, shingleN, seed),
        bands, numHashes / bands),
      maxBucketSize)
  }

  private def bucketMassOf(buckets: DataFrame, maxBucketSize: Int): DataFrame = {
    val mass = (col("bs").cast("decimal(38,0)") * (col("bs") - 1L) /
      lit(2)).cast("decimal(38,0)")
    buckets
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("bs"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("bs") > maxBucketSize, 1L).otherwise(0L))
          .as("buckets_dropped"),
        coalesce(sum(when(col("bs") <= maxBucketSize, mass)),
          lit(0).cast("decimal(38,0)")).cast("decimal(38,0)").as("pairs_planned"),
        coalesce(sum(when(col("bs") > maxBucketSize, mass)),
          lit(0).cast("decimal(38,0)")).cast("decimal(38,0)").as("pairs_dropped"))
      .select(col("band").cast("long").as("band"), col("buckets"),
        col("buckets_dropped"), col("pairs_planned"), col("pairs_dropped"))
  }

  /** Broadcast ceiling for the verify stage's candidate key set: two
    * BIGINTs per row, so 2^21 pairs ≈ 32 MB on the driver — comfortably
    * broadcastable; above it the probes pin shuffle-hash instead. The
    * sf1 scale run is the evidence this bound must exist: a dup-heavy
    * corpus (10 near-identical variants per doc) made `cands`
    * match-count-sized in the worst way and a FORCED broadcast OOM'd
    * the driver.
    */
  private[graft] val VerifyBroadcastMaxPairs: Long = 1L << 21

  /** True-Jaccard verification of candidate pairs against the shingle table.
    *
    * Broadcast discipline: `cands` is the bare (idA, idB) key set — far
    * smaller than anything carrying shingles, but MATCH-COUNT-SIZED and
    * therefore data-dependent (a dup-heavy corpus can grow it
    * quadratically in the duplication factor). It broadcasts into both
    * probe joins only under [[VerifyBroadcastMaxPairs]] (callers pass
    * the count they already materialized); beyond the bound the probes
    * run as shuffle-hash joins on the id key — the shingle side shuffles
    * once per probe, linear and never driver-bound. No array column ever
    * sits on a broadcast side in either regime (left to AQE, the array
    * side's bad size estimates caused multi-hundred-MB broadcasts and
    * 4-10x run variance).
    */
  private def verifyJaccard(base: DataFrame, cands: DataFrame, threshold: Double,
      candCount: Long): DataFrame = {
    // Two regimes. Small candidate set: broadcast the bare keys, pin the
    // final pair-up shuffle-hash (build side = cands-sized, fits). Large
    // candidate set (dup-heavy corpus): every join goes SORT-MERGE — the
    // only spillable strategy; a pinned shuffle-hash build of millions of
    // shingle-carrying rows OOMs a task exactly like the broadcast OOMs
    // the driver (both observed on the sf1 dup-heavy corpus).
    val small = candCount <= VerifyBroadcastMaxPairs
    val probe: DataFrame => DataFrame =
      if (small) c => broadcast(c) else c => c.hint("merge")
    val aSide = base.select(col("id").as("idA"), col("shingles").as("shA"))
      .join(probe(cands), Seq("idA"))
    val bSide = base.select(col("id").as("idB"), col("shingles").as("shB"))
      .join(probe(cands), Seq("idB"))
    aSide.join(bSide.hint(if (small) "shuffle_hash" else "merge"),
        Seq("idA", "idB"))
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("idA", "idB", "jaccard")
  }

  /** Lazy plan for [[verifiedPairs]] — exposed for plan-inspection tests. */
  private[graft] def verifiedPairsPlan(
      df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val base = shingleTable(df, idCol, textCol, cfg)
    // lazy plan: no candidate count exists yet — assume the broadcast
    // regime (what the plan-inspection tests pin for clean corpora)
    verifyJaccard(base, candidatePairs(sigTable(base, cfg), cfg),
      cfg.jaccardThreshold, candCount = 0L)
  }

  /** Candidate pairs verified by true shingle Jaccard >= threshold.
    *
    * Eagerly materialized: the result (actual near-dup suspects — orders of
    * magnitude smaller than the corpus) is persisted and counted so the
    * input-sized shingle cache can be dropped before returning. Callers get
    * a small cached DataFrame; nothing corpus-sized stays pinned.
    */
  def verifiedPairs(df: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    // Each expensive stage is persisted AND materialized before its
    // consumers run. This matters twice over: the downstream plan reads
    // every stage from more than one place (the bucket self-join reads the
    // sig pipeline twice, the two verify broadcasts read the candidate
    // subtree twice, both probe sides read the shingle table), and an
    // UNmaterialized cache is recomputed by each concurrent consumer rather
    // than computed once — measured 101s -> ~10s at sf0.1. The caches are
    // dropped on exit; only the result-sized pair set stays.
    val base = shingleTable(df, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val (as, bs) = coefficients(cfg)
    val sigs = sigsFromCached(base, as, bs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val cands = candidatePairs(sigs, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val out = verifyJaccard(base, cands, cfg.jaccardThreshold, nCands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the tiny pair set so the upstream caches can go
    cands.unpersist()
    sigs.unpersist()
    base.unpersist()
    out
  }

  /** INCREMENTAL near-dup against a persisted signature store — the loop
    * a 100 TB corpus actually runs daily: the store holds (id, shingles,
    * sig) for everything already ingested (the [[signatures]] output,
    * persisted through any table sink — ManifestTable append commits are
    * the natural fit); each arriving batch computes ITS OWN signatures,
    * generates only candidates that TOUCH the batch (new×store and
    * new×new band-bucket collisions — store×store pairs were found when
    * those docs arrived), and verifies them with the same broadcast-free
    * exact-Jaccard tail as [[verifiedPairs]]. Work per day is
    * O(batch × collision rate), never O(corpus²) and never a corpus
    * rescan; the bucket join keys on (band, bucket) exactly like the
    * batch path, so the store side shuffles its BUCKET rows only (8-byte
    * hashes), not shingles.
    *
    * Returns (idA, idB, jaccard) pairs with at least one batch endpoint,
    * oriented idA < idB. The caller then appends [[signatures]] of the
    * batch to the store (deterministic — same seed, same rows) to close
    * the loop. Batch and store ids must be disjoint (same contract as any
    * append).
    */
  def incrementalVerifiedPairs(
      store: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, cfg: Config): DataFrame = {
    val newSigs = signatures(batch, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newSigs.count()
    val out = incrementalCore(store, newSigs, bandBuckets(_, cfg),
      cfg.jaccardThreshold, cfg.maxBucketSize)
    newSigs.unpersist() // out is materialized pair-sized by the core
    out
  }

  /** Shared incremental tail: bucket both sides, apply the boilerplate
    * guard over the FULL bucket table (an oversized bucket is oversized
    * regardless of which side filled it), pair only where the left
    * endpoint is NEW, orient, dedup, verify. The xxhash64 and portable
    * pipelines both route through here — candidate discipline cannot
    * drift between them (same contract as [[capAndPair]] for the batch
    * paths).
    */
  private def incrementalCore(storeSigs: DataFrame, newSigs: DataFrame,
      toBuckets: DataFrame => DataFrame,
      threshold: Double, maxBucketSize: Int,
      storeBuckets: DataFrame = null): DataFrame = {
    // a deployed store keeps its band index MATERIALIZED at ingest (the
    // stored-sidecar discipline) — re-folding the whole store's bands on
    // every arriving batch is O(store) work the incremental pass exists
    // to avoid; callers without a stored index still get the fold
    val sb = if (storeBuckets != null) storeBuckets else toBuckets(storeSigs)
    val allBuckets = sb.unionByName(toBuckets(newSigs))
    val oversized = allBuckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bs"))
      .where(col("bs") > maxBucketSize)
      .select("band", "bucket")
    val sized = allBuckets.join(oversized, Seq("band", "bucket"), "left_anti")
    val newSide = sized.join(newSigs.select(col("id")), Seq("id"), "left_semi")
    val cands = newSide.select(col("band"), col("bucket"), col("id").as("l"))
      .join(sized.select(col("band"), col("bucket"), col("id").as("r")),
        Seq("band", "bucket"))
      .where(col("l") =!= col("r"))
      .select(least(col("l"), col("r")).as("idA"),
        greatest(col("l"), col("r")).as("idB"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val base = storeSigs.select(col("id"), col("shingles"))
      .unionByName(newSigs.select(col("id"), col("shingles")))
    // same discipline as verifiedPairs: the verify reads cands from BOTH
    // probes, so it stays cached until the pair-sized result is
    // materialized; only that result stays pinned for the caller
    val out = verifyJaccard(base, cands, threshold, nCands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cands.unpersist()
    out
  }

  /** [[signatures]] in the PORTABLE hash space (48-bit polynomial token/
    * shingle hashes, Mersenne-projected minima — the q13f pipeline): the
    * signature-store schema for corpora whose dedup state must be
    * replayable outside this engine. Returns (id, shingles, sig).
    */
  def portableSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleN: Int = 3, seed: Long = 7L): DataFrame = {
    val (as, bs) = portableCoefficients(numHashes, seed)
    Parallelism.ensureCompute(df)
      .select(col(idCol).as("id"),
        TextFunctions.portableShingleHashes(
          TextFunctions.portableTokenHashes(col(textCol)), shingleN).as("shingles"))
      .select(col("id"), col("shingles"),
        graft.plans.PolyHashExpressions.minhashSignature(
          transform(col("shingles"), h => pmod(h, lit(MersennePrime))),
          as, bs, MersennePrime).as("sig"))
  }

  /** Portable-space band buckets (48-bit polynomial fold over each band's
    * signature slice — the replayable analog of [[bandBuckets]]).
    */
  private def portableBandBuckets(sigs: DataFrame, bands: Int, r: Int): DataFrame = {
    val m48 = 1L << 48
    val bandIdx = sequence(lit(0), lit(bands - 1))
    sigs.where(size(col("sig")) > 0)
      .select(col("id"),
        explode(transform(bandIdx, b =>
          struct(b.as("band"),
            aggregate(slice(col("sig"), b * r + 1, lit(r)), b.cast("bigint"),
              (acc, v) => pmod(acc * lit(31L) + v, lit(m48))).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** [[incrementalVerifiedPairs]] in the portable hash space: the store
    * holds [[portableSignatures]] rows, the batch hashes itself the same
    * way, and every stage (signatures, band folds, bucket cap, verify) is
    * replayable bit-for-bit in SQL — which is exactly what q106's oracle
    * does, restricted like this pipeline to pairs touching the batch.
    */
  def portableIncrementalVerifiedPairs(
      storeSigs: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 8, shingleN: Int = 3,
      maxBucketSize: Int = 1000, seed: Long = 7L,
      storeIndex: DataFrame = null): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // a stale or mismatched materialized index (built with a different
    // banding) would silently drop candidate buckets — false-negative
    // dedup with no error. [[portableBandIndex]] stamps its banding into
    // the `band` column metadata; validate it here at zero scan cost.
    if (storeIndex != null) {
      val md = storeIndex.schema("band").metadata
      require(md.contains("numHashes") && md.contains("bands"),
        "storeIndex must be built by portableBandIndex (banding metadata " +
          "missing from the `band` column) — an index with unknown banding " +
          "cannot be verified against this call's (numHashes, bands)")
      require(md.getLong("numHashes") == numHashes && md.getLong("bands") == bands,
        s"storeIndex banding (numHashes=${md.getLong("numHashes")}, " +
          s"bands=${md.getLong("bands")}) does not match this call's " +
          s"(numHashes=$numHashes, bands=$bands) — candidates would be dropped")
    }
    val newSigs = portableSignatures(batch, idCol, textCol, numHashes, shingleN, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newSigs.count()
    val out = incrementalCore(storeSigs, newSigs,
      portableBandBuckets(_, bands, numHashes / bands), threshold, maxBucketSize,
      storeBuckets = storeIndex)
    newSigs.unpersist() // out is materialized pair-sized by the core
    out
  }

  /** The signature store's band-bucket index `(id, band, bucket)` in the
    * portable hash space — MATERIALIZE this at store-ingest time (one
    * row per (doc, band)) so each arriving batch pays only ITS OWN band
    * fold plus the bucket equi-join; re-deriving the store's bands per
    * batch is O(store) work that defeats the incremental contract at
    * 100 TB. Feed back via `storeIndex` on
    * [[portableIncrementalVerifiedPairs]].
    */
  def portableBandIndex(storeSigs: DataFrame,
      numHashes: Int = 16, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // stamp the banding into column metadata so the consumer can reject
    // a mismatched index without scanning it (schema-level, survives
    // checkpoint/parquet round-trips)
    val bandMd = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("numHashes", numHashes.toLong)
      .putLong("bands", bands.toLong)
      .build()
    portableBandBuckets(storeSigs, bands, numHashes / bands)
      .withColumn("band", col("band").as("band", bandMd))
  }

  /** EXACT n-gram-Jaccard near-dup pairs via prefix-filtered inverted-index
    * candidate generation (AllPairs/PPJoin prefix filter, Bayardo et al.,
    * WWW'07 — public algorithm).
    *
    * Unlike the minhash LSH path (probabilistic recall), this finds EVERY
    * pair with true Jaccard >= threshold: J(A,B) >= t implies
    * |A∩B| >= ceil(t·|A|), so under any global shingle order the first
    * |A| - ceil(t·|A|) + 1 shingles of A (its "prefix") must contain an
    * intersection element — candidates are pairs sharing a prefix shingle.
    * Ordering the global order by ascending document frequency makes
    * prefixes land on the RAREST shingles, so posting lists stay short and
    * the candidate set near-linear — the published 100 TB-scale recipe for
    * exact similarity self-join.
    *
    * Candidate pruning (all exactness-preserving, from the same paper):
    *  - length filter: J(A,B) >= t implies |A| >= t*|B| (wlog |A| <= |B|),
    *    so wildly different-sized docs never pair;
    *  - asymmetric prefixes: order each pair as (smaller, larger) by
    *    shingle-set size. The overlap bound O = ceil(t/(1+t)*(|A|+|B|))
    *    gives O >= ceil(2t/(1+t)*|A|) for the smaller side and
    *    O >= ceil(t*|B|) for the larger, and the SMALLEST common shingle
    *    under the global (df, hash) order must land inside both
    *    |x| - O_x + 1 prefixes — so the smaller side indexes only its
    *    short 2t/(1+t) prefix while the larger probes with its t prefix.
    *    At t=0.5 that is a ~len/3-vs-len/2 join instead of len/2 squared.
    *
    * Cost shape: one df-count aggregation over exploded shingles, one
    * window per doc to rank, one index-vs-probe join on prefix shingles,
    * then the same broadcast-free verify as the LSH path.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val base = shingleTable(df, idCol, textCol, Config(shingleN = shingleN))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // materialize before fan-out (see verifiedPairs)
    val cands = prefixCandidates(base, threshold)
    val nCands = cands.count() // cached by prefixCandidates — O(partitions)
    val out = verifyJaccard(base, cands, threshold, nCands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cands.unpersist()
    base.unpersist()
    out
  }

  /** [[jaccardPairs]]'s candidate stage, over an already-persisted shingle
    * table: the AllPairs/PPJoin prefix-filtered inverted-index self-join.
    * Returned candidate set is persisted+materialized (result-sized);
    * callers unpersist it when done. Exposed `private[graft]` so the skew
    * suite can assert candidate-count ceilings on adversarial corpora —
    * the near-linearity claim is the whole 100 TB argument for this path.
    */
  private[graft] def prefixCandidates(base: DataFrame, threshold: Double): DataFrame = {
    val exploded = base.select(col("id"), size(col("shingles")).as("len"),
      explode(col("shingles")).as("s"))
    val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    // probe prefix (the longer of the two cutoffs) is computed once and
    // persisted — it is prefix-sized, far smaller than the shingle table —
    // and the index prefix is a filter over it (alpha >= t, so shorter).
    val alpha = 2 * threshold / (1 + threshold)
    val ranked = exploded.join(freq, Seq("s"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("len") - ceil(lit(threshold) * col("len")).cast("int") + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranked.count() // both prefix sides read this — materialize once
    val index = ranked
      .where(col("rk") <= col("len") - ceil(lit(alpha) * col("len")).cast("int") + 1)
      .select(col("s"), col("id").as("idI"), col("len").as("lenI"))
    val probe = ranked.select(col("s"), col("id").as("idP"), col("len").as("lenP"))
    val cands = index.join(probe, Seq("s"))
      .where((col("lenI") < col("lenP") ||
          (col("lenI") === col("lenP") && col("idI") < col("idP"))) &&
        col("lenI").cast("double") >= lit(threshold) * col("lenP"))
      .select(least(col("idI"), col("idP")).as("idA"),
        greatest(col("idI"), col("idP")).as("idB"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands.count() // both verify broadcasts read this — materialize once
    ranked.unpersist()
    cands
  }

  /** EXACT cross-corpus n-gram-Jaccard pairs: every (a in A, b in B) with
    * J(a, b) >= threshold — never pairs within either corpus. The
    * incremental-ingest dedup shape: B = the existing corpus, A = the new
    * crawl batch; only A-vs-B duplication decides what enters.
    *
    * Exactness (prefix filter, cross-set form): J(a,b) >= t implies the
    * SMALLEST common shingle under the global ascending-(df, hash) order
    * sits within the first |x| - ceil(t·|x|) + 1 shingles of BOTH sides
    * (it is the first of >= ceil(t·|x|) intersection elements in either
    * sorted set), so joining the two prefix tables on the shingle loses
    * nothing. Document frequencies are taken over A ∪ B — one shared
    * order, prefixes on the rarest shingles. The t·|len| length filter
    * applies in both directions. Verify ships bare id pairs only.
    */
  def crossJaccardPairs(
      dfA: DataFrame, dfB: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val cfg = Config(shingleN = shingleN)
    val baseA = shingleTable(dfA, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseB = shingleTable(dfB, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    baseA.count(); baseB.count()
    def explodedOf(base: DataFrame) =
      base.select(col("id"), size(col("shingles")).as("len"),
        explode(col("shingles")).as("s"))
    val exA = explodedOf(baseA)
    val exB = explodedOf(baseB)
    // shared global order: document frequency over BOTH corpora
    val freq = exA.union(exB).groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    def prefixOf(ex: DataFrame, side: String) =
      ex.join(freq, Seq("s"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= col("len") - ceil(lit(threshold) * col("len")).cast("int") + 1)
        .select(col("s"), col("id").as(s"id$side"), col("len").as(s"len$side"))
    val cands = prefixOf(exA, "A").join(prefixOf(exB, "B"), Seq("s"))
      .where(col("lenA").cast("double") >= lit(threshold) * col("lenB") &&
        col("lenB").cast("double") >= lit(threshold) * col("lenA"))
      .select("idA", "idB")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    // same conditional probe as verifyJaccard: broadcast only under the
    // pair bound, shuffle-hash beyond it (cands is match-count-sized)
    val smallC = nCands <= VerifyBroadcastMaxPairs
    val probeC: DataFrame => DataFrame =
      if (smallC) c => broadcast(c) else c => c.hint("merge")
    val aSide = baseA.select(col("id").as("idA"), col("shingles").as("shA"))
      .join(probeC(cands), Seq("idA"))
    val bSide = baseB.select(col("id").as("idB"), col("shingles").as("shB"))
      .join(probeC(cands), Seq("idB"))
    val out = aSide.join(bSide.hint(if (smallC) "shuffle_hash" else "merge"),
        Seq("idA", "idB"))
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("idA", "idB", "jaccard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cands.unpersist()
    baseA.unpersist()
    baseB.unpersist()
    out
  }

  /** EXACT n-gram CONTAINMENT pairs: (idA, idB, containment) where
    * containment = |A∩B| / |A| >= threshold (A = idA's shingle set). Where
    * Jaccard is symmetric similarity, containment catches SUB-DOCUMENT
    * duplication — doc A quoted, excerpted, or wholly embedded inside a
    * larger doc B — the common long-tail duplication mode in web corpora
    * that Jaccard misses (a small doc inside a big one has low Jaccard but
    * containment 1.0).
    *
    * Exactness: |A∩B| >= ceil(t·|A|) forces at least one element of the
    * first |A| - ceil(t·|A|) + 1 shingles of A (under the global
    * ascending-(df, hash) order) to be in B — so A probes with only its
    * rare-shingle prefix while B is indexed in full (the probe-side-only
    * specialization of the AllPairs prefix filter; no length filter is
    * sound here since B may be arbitrarily large). Posting lists land on
    * the rarest shingles, keeping the candidate join near-linear; the
    * boilerplate tail of hot shingles never enters a probe prefix.
    *
    * Same portable shingle hashing and cache/broadcast discipline as
    * [[jaccardPairs]]; the verify step ships only bare id pairs.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val base = shingleTable(df, idCol, textCol, Config(shingleN = shingleN))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // materialize before fan-out (see verifiedPairs)
    val exploded = base.select(col("id"), size(col("shingles")).as("len"),
      explode(col("shingles")).as("s"))
    val freq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    val probe = exploded.join(freq, Seq("s"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("len") - ceil(lit(threshold) * col("len")).cast("int") + 1)
      .select(col("s"), col("id").as("idA"))
    val index = exploded.select(col("s"), col("id").as("idB"))
    val cands = probe.join(index, Seq("s"))
      .where(col("idA") =!= col("idB"))
      .select("idA", "idB")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count() // both verify probes read this — materialize once
    val smallC = nCands <= VerifyBroadcastMaxPairs
    val probeC: DataFrame => DataFrame =
      if (smallC) c => broadcast(c) else c => c.hint("merge")
    val aSide = base.select(col("id").as("idA"), col("shingles").as("shA"))
      .join(probeC(cands), Seq("idA"))
    val bSide = base.select(col("id").as("idB"), col("shingles").as("shB"))
      .join(probeC(cands), Seq("idB"))
    val out = aSide.join(bSide.hint(if (smallC) "shuffle_hash" else "merge"),
        Seq("idA", "idB"))
      .withColumn("containment",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(col("shA")).cast("double"))
      .where(col("containment") >= threshold)
      .select("idA", "idB", "containment")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cands.unpersist()
    base.unpersist()
    out
  }

  /** Coefficients for the PORTABLE minhash variant — exposed so the oracle
    * SQL generator embeds the exact same literals (same scheme as
    * [[coefficients]], parameterized count).
    */
  private[graft] def portableCoefficients(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime - 1)) + 1)
    val bs = Seq.fill(k)(math.abs(rnd.nextLong()) % MersennePrime)
    (as, bs)
  }

  /** PORTABLE minhash-LSH near-dup pairs — the [[verifiedPairs]] pipeline
    * re-expressed in engine-portable arithmetic, so EVERY stage (shingle
    * hashes -> permutation minima -> band buckets -> candidate pairs ->
    * Jaccard verify) is recomputed bit-for-bit by another engine: shingle
    * hashes are 48-bit polynomial folds of per-token char folds (see
    * [[TextFunctions.portableShingleHashes]]) instead of xxhash64, and band
    * buckets are 48-bit folds of the band's signature slice (init = band
    * index) instead of xxhash64. The DuckDB oracle replays the whole thing,
    * which puts the LSH candidate step itself — not just the exact verify —
    * through the correctness gate. Same plan shape and cache discipline as
    * [[verifiedPairs]]; use that one in production (xxhash64 is one
    * codegen'd call where the portable fold is a per-char loop).
    */
  def portableVerifiedPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 16, bands: Int = 8, shingleN: Int = 3,
      maxBucketSize: Int = 1000, seed: Long = 7L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val (as, bs) = portableCoefficients(numHashes, seed)
    val base = Parallelism.ensureCompute(df)
      .select(col(idCol).as("id"),
        TextFunctions.portableShingleHashes(
          TextFunctions.portableTokenHashes(col(textCol)), shingleN).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val sigs = sigsFromCached(base, as, bs) // cache scan = the barrier
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val cands = capAndPair(portableBandBuckets(sigs, bands, r), maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    val out = verifyJaccard(base, cands, threshold, nCands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cands.unpersist()
    sigs.unpersist()
    base.unpersist()
    out
  }

  /** The portable pipeline's CANDIDATE stage alone — exactly what
    * [[portableVerifiedPairs]] hands to its Jaccard verify, without the
    * verify. Exposed so the LSH layer itself can be SCORED against the
    * exact [[jaccardPairs]] ground truth (q133): candidate recall is the
    * quantity band/row settings are chosen by, and at 100 TB you pick
    * them from this readout on a sample, not from folklore. Same persist
    * discipline as the verified pipeline (result is pair-sized; the
    * corpus-sized shingle/signature caches are dropped before return).
    */
  def portableCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 8, shingleN: Int = 3,
      maxBucketSize: Int = 1000, seed: Long = 7L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (as, bs) = portableCoefficients(numHashes, seed)
    val base = Parallelism.ensureCompute(df)
      .select(col(idCol).as("id"),
        TextFunctions.portableShingleHashes(
          TextFunctions.portableTokenHashes(col(textCol)), shingleN).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val sigs = sigsFromCached(base, as, bs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val out = capAndPair(portableBandBuckets(sigs, bands, numHashes / bands),
        maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sigs.unpersist()
    base.unpersist()
    out
  }

  /** Transitive closure of dup pairs -> (id, rep) where rep = min id of the
    * connected component.
    *
    * Adaptive: the verified-pair set is orders of magnitude smaller than
    * the corpus (it only contains actual near-dups), so when it fits
    * comfortably on the driver (`driverThreshold` edges) we run a local
    * union-find — one collect, zero iterative jobs. Above the threshold we
    * fall back to distributed min-label propagation (each step a
    * partial-aggregatable groupBy-min), which handles arbitrarily large
    * edge sets at the cost of one join round per component diameter.
    */
  def duplicateGroups(pairs: DataFrame, maxIterations: Int = 15,
      driverThreshold: Long = 5000000L): DataFrame = {
    // full count (not limit+count): one clean materialization of the
    // persisted pair set — incremental-limit execution would re-run the
    // expensive upstream pipeline per scale-up attempt.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = p.count()
    if (n <= driverThreshold) {
      val out = duplicateGroupsLocal(p)
      p.unpersist() // edges live on the driver now; drop the cluster copy
      out
    } else {
      // duplicateGroupsDistributed re-persists its own (deduped, undirected)
      // edge table up front, so the raw pair cache can be dropped as soon as
      // that first materialization exists — not leaked for the session.
      val out = duplicateGroupsDistributed(p, maxIterations)
      p.unpersist()
      out
    }
  }

  /** Driver union-find over a collected edge list (small verified-pair
    * sets). Generic over the id type: reps match the distributed variant's
    * `least()` semantics (numeric order for numeric ids, lexicographic for
    * strings).
    */
  private def duplicateGroupsLocal(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = pairs.sparkSession
    val idField = pairs.schema("idA")
    val ord: Ordering[Any] = idField.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Ordering.by((x: Any) => x.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue)
      case StringType => Ordering.by((x: Any) => x.asInstanceOf[String])
      case other => throw new IllegalArgumentException(
        s"unsupported id type for local union-find: $other")
    }
    val edges = pairs.select(col("idA"), col("idB")).collect()
      .map(r => (r.get(0), r.get(1)))
    val parent = scala.collection.mutable.Map.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (lo, hi) = if (ord.lt(ra, rb)) (ra, rb) else (rb, ra)
        parent(hi) = lo
      }
    }
    val rows = parent.keys.toSeq.map(id => Row(id, find(id)))
    val schema = StructType(Seq(
      StructField("id", idField.dataType), StructField("rep", idField.dataType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Distributed min-label propagation (bounded iterations, early stop).
    * The returned label table is result-sized (one row per doc appearing in
    * a dup pair) and stays cached — callers may `unpersist()` it when done;
    * the input-sized edge cache is dropped before returning.
    */
  def duplicateGroupsDistributed(pairs: DataFrame, maxIterations: Int = 15): DataFrame = {
    // undirected edge list, both directions
    val fwd = pairs.select(col("idA").as("src"), col("idB").as("dst"))
    val edges = fwd.union(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("rep", "prev"), "id")
        .where(col("rep") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
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
