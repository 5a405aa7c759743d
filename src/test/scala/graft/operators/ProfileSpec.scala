package graft.operators

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, Option("a"), Option(10.0)),
    (2L, Option("b"), None),
    (3L, Option("a"), Option(30.0)),
    (4L, None, Option(10.0))
  ).toDF("id", "name", "score")

  test("profile: per-column nulls, exact distincts, min/max") {
    val got = Profile.profile(df, Seq("id", "name", "score"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("name") == ((4L, 1L, 2L, "a", "b")))
    assert(got("score") == ((4L, 1L, 2L, "10.0", "30.0")))
  }

  test("profile is ONE scan regardless of column count") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val plan = Profile.profile(docs, Seq("doc_id", "lang", "text"))
        .queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1,
        s"k-column profile must not cost k scans:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("unknown columns are rejected") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }
}
