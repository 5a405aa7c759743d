package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ChunkDedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = ("the quick brown fox jumps over the lazy dog " * 20).trim

  test("cdc boundaries follow content: a prefix edit leaves the tail chunks shared") {
    val docs = Seq((1L, base), (2L, "EDITED PREFIX " + base)).toDF("doc_id", "text")
    val chunks = ChunkDedup.chunkTable(docs, "doc_id", "text", modulus = 16L)
    val byDoc = chunks.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSeq }
    val shared = byDoc(1L).toSet intersect byDoc(2L).toSet
    assert(shared.nonEmpty,
      s"an edit must not reshape every chunk (fixed-size blocks would): $byDoc")
    // chunk lengths reconstruct the document exactly
    val lens = chunks.where(col("doc_id") === 1L)
      .agg(sum(col("chunk_len"))).head.getLong(0)
    assert(lens == base.length, s"chunk lengths must cover the text: $lens")
  }

  test("duplicatedChunks ledger: identical docs share every chunk; unique text none") {
    val docs = Seq((1L, base), (2L, base), (3L, "entirely different content here"))
      .toDF("doc_id", "text")
    val ledger = ChunkDedup.duplicatedChunks(docs, "doc_id", "text", modulus = 16L)
      .collect()
    val nChunks = ChunkDedup.chunkTable(docs.where(col("doc_id") === 1L),
      "doc_id", "text", 16L).count()
    assert(ledger.length >= 1, "identical docs must produce a non-empty ledger")
    ledger.foreach { r =>
      assert(r.getLong(2) >= 2L && r.getLong(4) == (r.getLong(2) - 1) * r.getLong(1))
    }
    // every one of doc 1's distinct chunks appears in the ledger with n_docs >= 2
    val dupKeys = ledger.map(_.getLong(0)).toSet
    val doc1Keys = ChunkDedup.chunkTable(docs.where(col("doc_id") === 1L),
      "doc_id", "text", 16L).select("chunk_key")
      .collect().map(_.getLong(0)).toSet
    assert(doc1Keys.subsetOf(dupKeys), s"missing shared chunks: $nChunks")
  }

  test("empty and null texts; determinism under repartitioning; modulus guard") {
    val docs = Seq((1L, Some(base)), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    val t = ChunkDedup.chunkTable(docs, "doc_id", "text", 32L)
    assert(t.where(col("doc_id") === 2L).count() == 0, "empty text has no chunks")
    assert(t.where(col("doc_id") === 3L).count() == 0, "null text has no chunks")
    val a = t.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = ChunkDedup.chunkTable(docs.repartition(7), "doc_id", "text", 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "chunking must be partitioning-independent")
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      ChunkDedup.chunkTable(docs, "doc_id", "text", 1L).collect()
    }
    assert(bad.getMessage.contains("modulus"))
  }

  test("packed chunk length SATURATES at 16383 — never wraps (executable spec)") {
    val M = 281474976710656L
    // plain-Scala reference of the documented contract, tracking TRUE lengths
    def ref(str: String, modulus: Long): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var h = 0L; var ch = 0L; var len = 0L
      str.foreach { c =>
        val cp = c.toLong
        ch = (ch * 131L + cp) % M
        len += 1L
        h = (h * 2L + ((cp + 1L) * 2654435761L) % M) % M
        if (h % modulus == 0L) { out += ((ch + math.min(len, 16383L) * M, len)); ch = 0L; len = 0L }
      }
      if (len > 0L) out += ((ch + math.min(len, 16383L) * M, len))
      out.toSeq
    }
    // a constant character stops cutting after ~12 symbols under a
    // power-of-two modulus (h mod 2^12 becomes the constant -g), so
    // this string is GUARANTEED to end in one giant >16383-symbol chunk
    val s = "a" * 20000
    val expect = ref(s, 4096L)
    assert(expect.exists(_._2 > 16383L),
      "test corpus failed to exercise saturation — adjust the generator")
    val got = Seq((1L, s)).toDF("doc_id", "text")
    val t = ChunkDedup.chunkTable(got, "doc_id", "text", modulus = 4096L)
      .orderBy(col("chunk_idx"))
      .select(col("chunk_key"), col("chunk_len")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(t.length == expect.length)
    t.zip(expect).foreach { case ((key, declen), (refKey, trueLen)) =>
      assert(key == refKey, "packed key must match the executable spec")
      assert(declen == math.min(trueLen, 16383L),
        s"decoded length $declen must saturate, not wrap (true $trueLen)")
      assert(declen >= 1L && declen <= 16383L)
    }
  }
}
