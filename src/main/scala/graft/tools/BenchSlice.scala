package graft.tools

import graft.{Sessions, SparkEntry}

/** Bench-harness reproduction on a subset of queries: same session, same
  * warmup, same noop-sink materialization as [[graft.Bench]], but only the
  * queries named on the command line — for isolating where bench-context
  * time goes (args: sfDir q1 q2 ...).
  */
object BenchSlice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = Sessions.local(Sessions.envCpus, "graft-bench-slice")
    locally {
      import org.apache.spark.sql.functions.{broadcast, desc}
      val warm = spark.range(1000000).selectExpr(
        "id % 100 AS k", "id AS v", "CAST(id AS DOUBLE) AS d",
        "array_repeat(id % 7, 8) AS arr", "CAST(id % 50 AS STRING) AS s")
      warm.selectExpr("k", "v",
          "aggregate(arr, 0L, (a, x) -> a + x) AS hof",
          "row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn")
        .where("rn <= 3")
        .write.format("noop").mode("overwrite").save()
      warm.groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v"),
          org.apache.spark.sql.functions.avg("d"),
          org.apache.spark.sql.functions.countDistinct("s"))
        .write.format("noop").mode("overwrite").save()
      warm.join(broadcast(spark.range(100).selectExpr("id AS k")), "k")
        .orderBy(desc("v")).limit(10)
        .write.format("noop").mode("overwrite").save()
      Seq("region", "nation", "supplier", "part", "customer", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.format("noop").mode("overwrite").save()
      }
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[slice] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
