package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def dest = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "v")

  private def source = Seq(
    (2L, "b", 20.0),   // unchanged -> keep dest row
    (3L, "c2", 30.0),  // changed   -> take source row
    (4L, "d", 40.0)    // new       -> insert
  ).toDF("id", "name", "v")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("merge semantics: keep / update / insert") {
    for (strategy <- Seq(Merge.MergeStrategy.BroadcastSource, Merge.MergeStrategy.ShuffleFullOuter)) {
      val out = Merge.merge(dest, source, Seq("id"), strategy)
      assert(asSet(out) == Set(
        Seq(1L, "a", 10.0), Seq(2L, "b", 20.0), Seq(3L, "c2", 30.0), Seq(4L, "d", 40.0)),
        s"strategy=$strategy")
    }
  }

  test("unchanged rows keep the OLD audit stamp (change predicate excludes audit cols)") {
    val d = Audit.stampAt(dest, lit("2024-01-01 00:00:00"))
    val s = Audit.stampAt(source, lit("2024-02-01 00:00:00"))
    val out = Merge.merge(d, s, Seq("id")).cache()
    val stampOf = out.select($"id", $"record_loaded_at".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(stampOf(1L).startsWith("2024-01-01"), "untouched row keeps stamp")
    assert(stampOf(2L).startsWith("2024-01-01"), "unchanged re-send keeps OLD stamp")
    assert(stampOf(3L).startsWith("2024-02-01"), "updated row takes source stamp")
    assert(stampOf(4L).startsWith("2024-02-01"), "insert takes source stamp")
  }

  test("merge is idempotent: merge(merge(T,S),S) == merge(T,S)") {
    val once = Merge.merge(dest, source, Seq("id"))
    val twice = Merge.merge(once, source, Seq("id"))
    assert(asSet(once) == asSet(twice))
  }

  test("null-safe change detection treats NULL as a value") {
    val d = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("id", "name")
    val s = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "name")
    val out = Merge.merge(d, s, Seq("id"))
    // row 1: x -> null is a change; row 2: null -> null is not
    assert(asSet(out) == Set(Seq(1L, null), Seq(2L, null)))
  }

  test("upsertBatch dedups the batch on pk first (at-least-once safety)") {
    val batch = Seq(
      (4L, "dup-old", 1.0), (4L, "dup-new", 2.0)
    ).toDF("id", "name", "v")
    val out = Merge.upsertBatch(dest, batch, Seq("id"), orderCols = Seq("v"))
    assert(out.where($"id" === 4L).select($"name").as[String].collect().toSeq == Seq("dup-new"))
  }
}
