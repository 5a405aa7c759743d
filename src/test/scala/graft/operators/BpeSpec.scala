package graft.operators

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Plain-Scala reference BPE (Sennrich): the executable spec. */
  private def referenceBpe(texts: Seq[String], iters: Int)
      : Seq[(Int, String, String, Long, String)] = {
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    var vocab: Map[String, Vector[String]] =
      words.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val out = Seq.newBuilder[(Int, String, String, Long, String)]
    for (it <- 1 to iters) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + words(w))
      }
      if (pc.nonEmpty) {
        val ((l, r), n) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((it, l, r, n, l + r))
        vocab = vocab.map { case (w, syms) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          w -> merged.result()
        }
      }
    }
    out.result()
  }

  test("trainMerges equals the reference BPE, incl. the greedy aaaa case") {
    // 'aaaa' makes (a,a) dominate; greedy left-to-right must fuse it to
    // [aa, aa] (not [aa, a, a]), so iteration 2's top pair is (aa, aa)
    val texts = Seq("aaaa aaaa aaaa", "aaaa ab", "ab ab")
    val got = Bpe.trainMerges(texts.toDF("text"), "text", iters = 3)
      .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
    val want = referenceBpe(texts, 3)
    assert(got == want, s"got $got, want $want")
    assert(got.head._5 == "aa" && got(1)._2 == "aa",
      s"iteration 2 must build on iteration 1's fused token: $got")
  }

  test("trainMerges: tie on count breaks lexicographically") {
    // pairs (x,y) and (y,z) both occur exactly twice; (x,y) < (y,z)
    val texts = Seq("xyz xyz")
    val got = Bpe.trainMerges(texts.toDF("text"), "text", iters = 1)
      .as[(Int, String, String, Long, String)].collect().toSeq
    assert(got == Seq((1, "x", "y", 2L, "xy")), s"got $got")
    assert(got == referenceBpe(texts, 1))
  }

  test("trainMerges: merges stop early when the vocabulary exhausts its pairs") {
    // single 1-char word: [a, </w>] -> merge 1 fuses to [a</w>]; no
    // pairs remain, so iterations 2+ emit nothing
    val got = Bpe.trainMerges(Seq("a a").toDF("text"), "text", iters = 5)
      .as[(Int, String, String, Long, String)].collect().toSeq
    assert(got == Seq((1, "a", "</w>", 2L, "a</w>")), s"got $got")
  }

  test("trainMerges: longer run equals the reference on a mixed corpus") {
    val texts = Seq("the quick brown fox", "the lazy dog the dog",
      "quick quick brown", "fox dog lazy the")
    val got = Bpe.trainMerges(texts.toDF("text"), "text", iters = 6)
      .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == referenceBpe(texts, 6), s"got $got")
  }

  test("applyMerges/tokenFrequencies: trained merges tokenize like the reference") {
    val texts = Seq("the quick brown fox", "the lazy dog the dog",
      "quick quick brown", "fox dog lazy the")
    val merges = referenceBpe(texts, 4).map(m => (m._2, m._3))
    val got = Bpe.tokenFrequencies(texts.toDF("text"), "text", merges)
      .as[(String, Long)].collect().toMap
    // reference tokenization with the same merges
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    val want = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      var syms = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.foreach(t => want(t) = want.getOrElse(t, 0L) + c)
    }
    assert(got == want.toMap, s"got $got, want $want")
    assert(got.keys.exists(t => t.length > 1 && t != "</w>"),
      "at least one merged token must carry mass")
  }

  test("trainMerges/tokenFrequencies survive backslashes and quotes in the corpus") {
    // '\' is an escape char to Spark's SQL parser and ''' ends a literal:
    // both must round-trip the literal splice in fuseExpr unharmed
    val texts = Seq("""a\tb a\tb c\\ it's""", """a\tb it's \ \""")
    val got = Bpe.trainMerges(texts.toDF("text"), "text", iters = 5)
      .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == referenceBpe(texts, 5), s"got $got")
    val merges = referenceBpe(texts, 3).map(m => (m._2, m._3))
    val freq = Bpe.tokenFrequencies(texts.toDF("text"), "text", merges)
      .as[(String, Long)].collect().toMap
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    val want = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      var syms = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.foreach(t => want(t) = want.getOrElse(t, 0L) + c)
    }
    assert(freq == want.toMap, s"got $freq, want $want")
  }

  test("trainMerges: argument guards") {
    intercept[IllegalArgumentException] {
      Bpe.trainMerges(Seq("a").toDF("text"), "text", iters = 0)
    }
  }
}
