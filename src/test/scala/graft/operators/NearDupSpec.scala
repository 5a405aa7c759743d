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
}
