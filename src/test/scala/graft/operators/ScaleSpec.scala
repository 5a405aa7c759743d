package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("saltedAgg equals plain agg on skewed data") {
    // heavy hitter: 10k rows of one key, a few of others
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      Seq(("a", 1.0), ("b", 2.0), ("b", 3.0))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val salted = Scale.saltedAgg(df, Seq("k"), saltBuckets = 8)(
      phase1 = Seq(sum($"v").as("s"), count(lit(1)).as("n")),
      phase2 = Seq(sum($"s").as("s"), sum($"n").as("n")))
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
  }

  test("saltedJoin equals plain join on skewed keys, spreads the hot key") {
    val fact = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      Seq((9001L, "a"), (9002L, "b"))).toDF("row_id", "k")
    val dim = Seq(("hot", 10), ("a", 20), ("b", 30), ("c", 40)).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).select($"row_id", $"k", $"attr")
    val salted = Scale.saltedJoin(fact, dim, "k", "row_id", saltBuckets = 8)
      .select($"row_id", $"k", $"attr")
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    // the hot key's fact rows really land in multiple salt buckets
    val buckets = fact.where($"k" === "hot")
      .select(pmod(xxhash64($"row_id"), lit(8)).cast("int").as("b"))
      .distinct().count()
    assert(buckets > 4, s"expected the hot key spread over buckets, got $buckets")
    // left join keeps unmatched fact rows exactly once
    val factExtra = fact.union(Seq((9003L, "nodim")).toDF("row_id", "k"))
    val left = Scale.saltedJoin(factExtra, dim, "k", "row_id", 8, "left")
    assert(left.where($"k" === "nodim").count() == 1)
    // right/full would multiply unmatched dim rows -> must be rejected
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(fact, dim, "k", "row_id", 8, "right")
    }
  }

  test("bucketed join plans without a shuffle exchange") {
    // a previous JVM's managed-table location survives the metastore; clear it
    for (t <- Seq("orders_b", "customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    Scale.writeBucketed(orders, "orders_b", Seq("o_custkey"), numBuckets = 8)
    Scale.writeBucketed(customer, "customer_b", Seq("o_custkey"), numBuckets = 8)
    val joined = Scale.bucketedJoin(spark, "orders_b", "customer_b", Seq("o_custkey"))
      // force SMJ: disable broadcast so the co-location is what's tested
    val smjJoined = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val j = Scale.bucketedJoin(spark, "orders_b", "customer_b", Seq("o_custkey"))
        assert(!Scale.planHasExchange(j),
          s"bucketed join must be exchange-free:\n${j.queryExecution.executedPlan}")
        j.count()
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    assert(smjJoined == joined.count())
  }

  test("q92 multi-join: every join broadcasts, the fact table never join-shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.Queries.q92MultiJoinRevenue(spark, sf)
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.size == 5, s"six tables -> five joins:\n$plan")
      joins.foreach { j =>
        assert(j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec],
          s"expected broadcast at this scale, got ${j.getClass.getSimpleName}:\n$j")
      }
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }
      assert(shuffles.size == 1,
        s"only the final groupBy may exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("kmvOverlapEstimate: identical, disjoint and subset sets behave") {
    import spark.implicits._
    val a = (1 to 500).map(_.toLong).toDF("k")
    val same = Scale.kmvOverlapEstimate(a, "k", a, "k", k = 64).head()
    // identical sets: every union-sketch hash is in both sides
    assert(same.getLong(1) == 64L, s"rho must be k: $same")
    assert(same.getDouble(3) == same.getDouble(4), "est_union == est_intersection")
    assert((same.getLong(5), same.getLong(6)) == ((500L, 500L)))
    // estimate within 4/sqrt(k) = 50% of truth (generous, deterministic)
    assert(math.abs(same.getDouble(3) - 500.0) < 250.0, s"est: $same")
    val b = (1001 to 1500).map(_.toLong).toDF("k")
    val disj = Scale.kmvOverlapEstimate(a, "k", b, "k", k = 64).head()
    assert(disj.getLong(1) == 0L && disj.getDouble(4) == 0.0,
      s"disjoint sets: rho and est_intersection must be 0: $disj")
    assert(disj.getLong(5) == 1000L && disj.getLong(6) == 0L)
  }

  test("kmvOverlapEstimate refuses a union smaller than k") {
    import spark.implicits._
    val tiny = (1 to 20).map(_.toLong).toDF("k")
    val e = intercept[Exception] {
      Scale.kmvOverlapEstimate(tiny, "k", tiny, "k", k = 64).head()
    }
    assert(e.getMessage != null && e.getMessage.contains("fewer than k"),
      s"got: ${e.getMessage}")
  }

  test("skewReport: uniform keys gini 0, hot key dominates, hand shares") {
    import spark.implicits._
    // 10 keys x 10 rows each: perfectly uniform
    val uniform = (0 until 100).map(i => (i % 10).toLong).toDF("k")
    val u = Scale.skewReport(uniform, Seq("k")).head()
    assert(u.getLong(0) == 100L && u.getLong(1) == 10L, s"got $u")
    assert(u.getDouble(4) == 0.0, s"uniform keys must gini 0: $u")
    assert(u.getDouble(2) == 0.1 && u.getDouble(3) == 1.0, s"got $u")
    // one key owns 91 of 100 rows
    val hot = ((0 until 91).map(_ => 0L) ++ (1 to 9).map(_.toLong)).toDF("k")
    val h = Scale.skewReport(hot, Seq("k")).head()
    assert(h.getDouble(2) == 0.91, s"max_share: $h")
    assert(h.getDouble(4) > 0.8, s"hot key must push gini high: $h")
  }

  test("skewReport: deterministic under repartitioning; guards") {
    import spark.implicits._
    val keys = (0 until 500).map(i => (i.toLong % 37) * (i.toLong % 5 + 1))
      .toDF("k")
    val a = Scale.skewReport(keys, Seq("k")).head()
    val b = Scale.skewReport(keys.repartition(13), Seq("k")).head()
    assert(a == b, "rank-tie blocks must make the report partitioning-proof")
    intercept[IllegalArgumentException] {
      Scale.skewReport(keys, Seq.empty)
    }
  }
}
