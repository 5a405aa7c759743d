package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev harness: per-JOB wall-time attribution inside a query run.
  *
  * Registers a listener recording every job's (id, callsite, duration) and
  * runs each named query TWICE through the noop sink (the bench
  * methodology), printing the second run's job table — the steady-state
  * profile with codegen/broadcast warmup out of the way. Call sites name
  * the operator line that triggered the job (localCheckpoint at X, collect
  * at Y, save at Z), which is exactly the intra-query breakdown the Spark
  * UI would give if it were enabled in this sandbox.
  *
  * Usage: runMain graft.tools.ProfileJobs <sfDir> <q1> [q2...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = Sessions.local(Sessions.envCpus, "graft-profile-jobs")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's name carries the action callsite
        // ("localCheckpoint at Preference.scala:160", "save at Bench...")
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = starts.remove(e.jobId)
        if (st != null)
          rows.add((e.jobId, st._2, (System.nanoTime() - st._1) / 1e9))
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(tag: String): Unit = {
        rows.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // give the listener bus a beat to deliver trailing job-end events
        Thread.sleep(300)
        val js = rows.toArray(Array.empty[(Int, String, Double)]).sortBy(_._1)
        println(f"===== $name $tag wall=$wall%.2f s jobs=${js.length} " +
          f"jobsum=${js.map(_._3).sum}%.2f s =====")
        js.foreach { case (id, site, d) => println(f"  job$id%4d $d%7.3f s  $site") }
        val bySite = js.groupBy(_._2).map { case (s, g) =>
          (s, g.map(_._3).sum, g.length) }.toSeq.sortBy(-_._2)
        println(s"  -- by call site --")
        bySite.foreach { case (s, d, n) => println(f"  $d%7.3f s  x$n%-3d $s") }
      }
      run("run1(warm-up)")
      run("run2(steady)")
    }
    spark.stop()
  }
}
