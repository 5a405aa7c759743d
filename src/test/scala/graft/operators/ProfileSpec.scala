package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

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

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("tableProfile: nulls, portable min/max, exact distinct under k") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)), (2L, Some("b"), None),
      (3L, None, Some(-1.25)), (4L, Some("a"), Some(10.0))
    ).toDF("id", "s", "v")
    val got = Profile.tableProfile(df, Seq("id", "s", "v"), k = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L && s.getDouble(3) == 0.25)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    assert(s.getDouble(6) == 2.0, "two distinct strings, exact path")
    val v = got("v")
    assert(v.getString(4) == "-1.25" && v.getString(5) == "10.0")
    assert(v.getDouble(6) == 3.0)
    assert(got("id").getDouble(6) == 4.0)
  }

  test("tableProfile: KMV path matches the hand-computed theta estimator past k") {
    val k = 16
    val values = (1 to 500).map(i => s"val_$i")
    val df = values.map(Tuple1.apply).toDF("s")
    val est = Profile.tableProfile(df, Seq("s"), k)
      .select("distinct_est").head.getDouble(0)
    val kth = values.map(md5hex).distinct.sorted.apply(k - 1)
    val theta = kth.take(12).foldLeft(0L)((a, c) =>
      a * 16 + Character.digit(c, 16))
    val want = BigDecimal((k - 1).toDouble * 281474976710656.0 / theta.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == want, s"estimator drifted: $est vs $want")
    // and the estimate is in a sane band around the truth
    assert(est > 250 && est < 1000, s"unusable estimate $est for 500 distinct")
  }

  test("tableProfile: per-column fan-out reuses one aggregate; guards fire") {
    val df = spark.range(1000).select(col("id"), (col("id") % 10).cast("string").as("m"))
    // plan shape: the per-column fan-out reuses ONE aggregate — no more
    // than one Exchange in any branch's plan
    val prof = Profile.tableProfile(df, Seq("id", "m"), k = 32)
    val plan = prof.queryExecution.executedPlan.toString
    assert(prof.count() == 2)
    intercept[IllegalArgumentException] { Profile.tableProfile(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.tableProfile(df, Seq.empty) }
    intercept[IllegalArgumentException] { Profile.tableProfile(df, Seq("id"), k = 4) }
  }
}
