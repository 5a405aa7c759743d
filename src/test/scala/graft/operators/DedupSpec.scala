package graft.operators

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("fullRow removes exact duplicates and is a fixpoint") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "v")
    val once = Dedup.fullRow(df)
    assert(once.count() == 2)
    assert(Dedup.fullRow(once).count() == 2)
  }

  test("byKeyLatest keeps the greatest (order, tiebreak) row per key") {
    val df = Seq(
      (1, 10, "old"), (1, 20, "new"),
      (2, 5, "only"),
      (3, 7, "tie-a"), (3, 7, "tie-b")
    ).toDF("k", "ord", "v")
    val out = Dedup.byKeyLatest(df, Seq("k"), Seq("ord", "v")).orderBy("k")
    assert(out.select($"v").as[String].collect().toSeq == Seq("new", "only", "tie-b"))
  }

  test("byContent keeps the min-id row per distinct content") {
    val df = Seq(
      (3L, "same"), (1L, "same"), (2L, "other")
    ).toDF("doc_id", "text")
    val out = Dedup.byContent(df, "text", "doc_id").orderBy("doc_id")
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(1L, 2L))
  }
}
