package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Planted near-duplicate corpus: MinHash and SimHash must find the planted
  * pairs and must not merge unrelated docs.
  */
class NearDupSpec extends SparkSuite {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single morning"
  // near-dup: one word changed
  private val nearDup = base.replace("lazy", "sleepy")
  // chains: A~B and B~C but A!~C directly (transitivity must close the group)
  private val mid = base.replace("lazy", "sleepy").replace("quick", "fast")
  private val unrelated1 =
    "completely different content about distributed query engines and columnar storage formats for analytical workloads at scale"
  private val unrelated2 =
    "yet another unrelated document discussing streaming watermarks state stores and exactly once processing semantics in detail"

  private def corpus = Seq(
    (1L, base), (2L, nearDup), (3L, mid), (4L, unrelated1), (5L, unrelated2)
  ).toDF("doc_id", "text")

  test("minhash finds planted near-dups, keeps unrelated docs") {
    val cfg = MinHashDedup.Config(jaccardThreshold = 0.5, shingleN = 3)
    val pairs = MinHashDedup.verifiedPairs(corpus, "doc_id", "text", cfg)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      s"unrelated docs must not pair: $pairs")

    val kept = MinHashDedup.dedup(corpus, "doc_id", "text", cfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(4L) && kept.contains(5L))
    assert(!kept.contains(2L), "near-dup of doc 1 must be dropped")
  }

  test("incremental near-dup vs a manifest-persisted signature store == one-shot batch run") {
    // day 1: docs 1, 4 ingested; signatures persisted via ManifestTable.
    // day 2: docs 2, 3, 5 arrive; incremental pass must surface exactly
    // the full-corpus pairs that touch the new batch (all of them here —
    // every planted pair spans the two days) without rescanning day 1.
    val cfg = MinHashDedup.Config(jaccardThreshold = 0.5, shingleN = 3)
    val day1 = corpus.where($"doc_id".isin(1L, 4L))
    val day2 = corpus.where(!$"doc_id".isin(1L, 4L))
    val root = java.nio.file.Files.createTempDirectory("graft_sigstore").resolve("s").toString
    ManifestTable.commit(spark, root,
      MinHashDedup.signatures(day1, "doc_id", "text", cfg), Seq("id"))
    val store = ManifestTable.read(spark, root)
    val inc = MinHashDedup.incrementalVerifiedPairs(store, day2, "doc_id", "text", cfg)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val full = MinHashDedup.verifiedPairs(corpus, "doc_id", "text", cfg)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val day1Only = MinHashDedup.verifiedPairs(day1, "doc_id", "text", cfg)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(inc.union(day1Only) == full,
      s"incremental $inc + day1 $day1Only must equal one-shot $full")
    assert(inc.forall { case (a, b) => !(Set(1L, 4L)(a) && Set(1L, 4L)(b)) },
      s"incremental pass must never re-emit store-only pairs: $inc")
    // close the loop: append day 2's signatures; the store now serves day 3
    ManifestTable.commit(spark, root,
      MinHashDedup.signatures(day2, "doc_id", "text", cfg), Seq("id"), append = true)
    assert(ManifestTable.read(spark, root).count() == corpus.count())
  }

  test("portable incremental pass with a stored band index == the store-refolding pass") {
    // the 100 TB contract: the store's (id, band, bucket) index is an
    // ingest-time artifact; feeding it back must change NOTHING about
    // the pairs — same folds, same rows, just not re-derived per batch
    val day1 = corpus.where($"doc_id".isin(1L, 4L))
    val day2 = corpus.where(!$"doc_id".isin(1L, 4L))
    val store = MinHashDedup.portableSignatures(day1, "doc_id", "text")
      .localCheckpoint()
    val idx = MinHashDedup.portableBandIndex(store).localCheckpoint()
    def pairs(si: org.apache.spark.sql.DataFrame) =
      MinHashDedup.portableIncrementalVerifiedPairs(
          store, day2, "doc_id", "text", threshold = 0.5, storeIndex = si)
        .select("idA", "idB").as[(Long, Long)].collect().toSet
    val withIdx = pairs(idx)
    val without = pairs(null)
    assert(withIdx == without,
      s"stored-index pass $withIdx must equal refolding pass $without")
    assert(withIdx.nonEmpty, "fixture must surface at least one pair")
    // banding-mismatch guard: an index built under a DIFFERENT banding
    // (or one lacking the metadata stamp entirely) must be rejected —
    // silently dropping candidate buckets is a false-negative dedup
    val wrongBanding = MinHashDedup.portableBandIndex(store, bands = 4)
    val eBand = intercept[IllegalArgumentException] {
      MinHashDedup.portableIncrementalVerifiedPairs(
        store, day2, "doc_id", "text", threshold = 0.5,
        storeIndex = wrongBanding)
    }
    assert(eBand.getMessage.contains("does not match"), eBand.getMessage)
    val unstamped = idx.select(col("id"), col("band").cast("int").as("band"),
      col("bucket"))
    val eMeta = intercept[IllegalArgumentException] {
      MinHashDedup.portableIncrementalVerifiedPairs(
        store, day2, "doc_id", "text", threshold = 0.5,
        storeIndex = unstamped)
    }
    assert(eMeta.getMessage.contains("metadata"), eMeta.getMessage)
    // and the stamp survives the artifact's disk round-trip (the store
    // keeps its index as a parquet sidecar)
    val pq = java.nio.file.Files.createTempDirectory("graft_bandidx")
      .resolve("i").toString
    idx.write.parquet(pq)
    assert(pairs(spark.read.parquet(pq)) == without,
      "parquet round-tripped index must still validate and match")
  }

  test("streaming incremental dedup: per-batch incremental pairs accumulate to the one-shot set") {
    // the full daily loop, three arrivals: store seeded EMPTY (a 0-file
    // manifest commit — the cold-start edge), each batch finds its
    // incremental pairs (new x store AND new x new) and appends its
    // signatures; the union over batches must equal one-shot verifiedPairs
    val cfg = MinHashDedup.Config(jaccardThreshold = 0.5, shingleN = 3)
    val root = java.nio.file.Files.createTempDirectory("graft_sigloop").resolve("s").toString
    val empty = MinHashDedup.signatures(corpus.limit(0), "doc_id", "text", cfg)
    ManifestTable.commit(spark, root, empty, Seq("id"))
    val batches = Seq(Seq(1L, 4L), Seq(2L, 5L), Seq(3L))
    val acc = scala.collection.mutable.Set.empty[(Long, Long)]
    batches.foreach { ids =>
      val batch = corpus.where($"doc_id".isin(ids: _*))
      val store = ManifestTable.read(spark, root)
      acc ++= MinHashDedup.incrementalVerifiedPairs(store, batch, "doc_id", "text", cfg)
        .select("idA", "idB").as[(Long, Long)].collect()
      ManifestTable.commit(spark, root,
        MinHashDedup.signatures(batch, "doc_id", "text", cfg), Seq("id"), append = true)
    }
    val full = MinHashDedup.verifiedPairs(corpus, "doc_id", "text", cfg)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(acc.toSet == full, s"accumulated $acc != one-shot $full")
  }

  test("duplicateGroups closes chains transitively") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (7L, 8L, 0.9))
      .toDF("idA", "idB", "jaccard")
    val groups = MinHashDedup.duplicateGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L)
    assert(groups(7L) == 7L && groups(8L) == 7L)
  }

  test("simhash: near-dups within hamming radius, unrelated far apart") {
    val fps = SimHashDedup.fingerprints(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(1L), fps(2L)) < hamming(fps(1L), fps(4L)),
      "similar docs must be closer in hamming space than unrelated ones")
    val pairs = SimHashDedup.nearDupPairs(corpus, "doc_id", "text",
      SimHashDedup.Config(maxHamming = 8))
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((4L, 5L)), "unrelated docs must not pair")
  }

  test("distributed fingerprints equal the scalar simhash expression") {
    val byTable = SimHashDedup.fingerprintsDistributed(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val byExpr = SimHashDedup.fingerprints(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(byTable == byExpr)
  }

  test("signatures: empty/short docs never become candidates") {
    val df = Seq((1L, "one two"), (2L, "")).toDF("doc_id", "text")
    val sigs = MinHashDedup.signatures(df, "doc_id", "text", MinHashDedup.Config())
    assert(sigs.where(size($"sig") > 0).count() == 0) // all below shingleN
  }

  test("no broadcast side in the verify pipeline carries an array column") {
    // the 100 TB contract: shingle/signature arrays are huge and badly
    // size-estimated — only bare id pairs may be broadcast. Plan-inspect
    // with AQE off so the compile-time joins are what's asserted.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = MinHashDedup.verifiedPairsPlan(corpus, "doc_id", "text",
        MinHashDedup.Config(jaccardThreshold = 0.5, shingleN = 3))
      val bcasts = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(bcasts.nonEmpty, "expected pinned broadcasts of the pair keys")
      bcasts.foreach { b =>
        val arrayCols = b.output.filter(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(arrayCols.isEmpty,
          s"broadcast side carries array columns ${arrayCols.map(_.name)}:\n$b")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("duplicateGroups handles string ids in the local union-find path") {
    val pairs = Seq(("b", "c", 0.9), ("a", "b", 0.9), ("x", "y", 0.8))
      .toDF("idA", "idB", "jaccard")
    val groups = MinHashDedup.duplicateGroups(pairs)
      .as[(String, String)].collect().toMap
    assert(groups("a") == "a" && groups("b") == "a" && groups("c") == "a")
    assert(groups("x") == "x" && groups("y") == "x")
  }

  test("simhash maxHamming=0 pairs exact duplicates (64-bit chunk mask)") {
    val df = Seq((1L, base), (2L, base), (3L, unrelated1)).toDF("doc_id", "text")
    val pairs = SimHashDedup.nearDupPairs(df, "doc_id", "text",
      SimHashDedup.Config(maxHamming = 0))
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccardPairs is exact: equals brute-force all-pairs Jaccard") {
    import graft.functions.TextFunctions
    val sh = corpus.select($"doc_id",
      TextFunctions.shingles($"text", 3).as("s"))
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .where($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("idA"), $"b.doc_id".as("idB"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") /
          size(array_union($"a.s", $"b.s")).cast("double")).as("j"))
      .where($"j" >= 0.5)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    val exact = MinHashDedup.jaccardPairs(corpus, "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(exact == brute && exact.nonEmpty,
      s"prefix-filter candidates must lose nothing: exact=$exact brute=$brute")
  }

  test("containmentPairs is exact and catches embedded sub-documents") {
    import graft.functions.TextFunctions
    // doc 6 is a small excerpt embedded in doc 1: containment(6 -> 1) is
    // 1.0 while Jaccard(1, 6) is far below any useful threshold.
    val excerpt = "jumps over the lazy dog while the cat watches"
    val docs = corpus.union(Seq((6L, excerpt)).toDF("doc_id", "text"))
    val sh = docs.select($"doc_id",
      TextFunctions.shingles($"text", 3).as("s"))
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .where($"a.doc_id" =!= $"b.doc_id" && size($"a.s") > 0 && size($"b.s") > 0)
      .select($"a.doc_id".as("idA"), $"b.doc_id".as("idB"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") /
          size($"a.s").cast("double")).as("c"))
      .where($"c" >= 0.8)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    val exact = MinHashDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.8, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(exact == brute, s"containment must equal brute force: $exact vs $brute")
    assert(exact.contains((6L, 1L)), s"embedded excerpt must be caught: $exact")
    assert(!exact.contains((1L, 6L)), "containment is asymmetric")
  }

  test("crossJaccardPairs is exact across corpora and never pairs within one") {
    import graft.functions.TextFunctions
    val a = Seq((10L, base), (11L, unrelated1)).toDF("doc_id", "text")
    val b = corpus // contains near-dups of base (ids 2, 3) and unrelated2
    val sh = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      TextFunctions.shingles($"text", 3).as("s"))
    val brute = sh(a).as("a").crossJoin(sh(b).as("b"))
      .where(size($"a.s") > 0 && size($"b.s") > 0)
      .select($"a.doc_id".as("idA"), $"b.doc_id".as("idB"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") /
          size(array_union($"a.s", $"b.s")).cast("double")).as("j"))
      .where($"j" >= 0.5)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    val exact = MinHashDedup.crossJaccardPairs(a, b, "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(exact == brute && exact.nonEmpty,
      s"cross prefix filter must lose nothing: exact=$exact brute=$brute")
    // 10 is a verbatim copy of corpus doc 1 -> must pair; the within-B
    // near-dup pair (1, 2) must NOT appear
    assert(exact.contains((10L, 1L)))
    assert(exact.forall { case (x, y) => Set(10L, 11L)(x) && !Set(10L, 11L)(y) },
      s"pairs must go A -> B only: $exact")
  }

  test("crossJaccardPairs agrees with the self-join restricted across the split") {
    // the cross-corpus operator must find exactly the self-join pairs of
    // A ∪ B that straddle the split — no extra, no fewer
    val a = Seq((10L, base), (11L, unrelated1)).toDF("doc_id", "text")
    val b = corpus
    val self = MinHashDedup.jaccardPairs(a.union(b), "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val aIds = Set(10L, 11L)
    val straddling = self.collect {
      case (x, y) if aIds(x) && !aIds(y) => (x, y)
      case (x, y) if aIds(y) && !aIds(x) => (y, x)
    }
    val cross = MinHashDedup.crossJaccardPairs(a, b, "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(cross == straddling, s"cross=$cross straddling=$straddling")
  }

  test("native minhash signature equals the HOF executable spec") {
    import graft.functions.TextFunctions
    val p = (1L << 31) - 1
    val (as, bs) = MinHashDedup.portableCoefficients(16, 7L)
    val hofPerms = array(as.zip(bs).map { case (a, b) =>
      array_min(transform($"hm", x => pmod(lit(a) * x + lit(b), lit(p))))
    }: _*)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        transform(TextFunctions.hashedShingles($"text", 3), h => pmod(h, lit(p))).as("hm"))
      .union(Seq((-1L, Seq.empty[Long])).toDF("doc_id", "hm")) // empty-input contract
    val mismatch = docs.select(
        graft.plans.PolyHashExpressions.minhashSignature($"hm", as, bs, p).as("native"),
        when(size($"hm") === 0, array().cast("array<bigint>")).otherwise(hofPerms).as("hof"))
      .where(not($"native" <=> $"hof"))
    assert(mismatch.count() == 0, "native signature diverged from HOF spec")
  }

  test("portable minhash finds planted pairs, subset of exact Jaccard pairs") {
    val portable = MinHashDedup.portableVerifiedPairs(
      corpus, "doc_id", "text", threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(portable.contains((1L, 2L)), s"expected (1,2) in $portable")
    assert(!portable.exists(p => p._1 >= 4L || p._2 >= 4L),
      s"unrelated docs must not pair: $portable")
    // LSH is a filter over the exact pair set: candidates it keeps must all
    // verify, so portable ⊆ exact (recall may be < 1, never precision)
    val exact = MinHashDedup.jaccardPairs(corpus, "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(portable.subsetOf(exact), s"portable=$portable exact=$exact")
  }
}
