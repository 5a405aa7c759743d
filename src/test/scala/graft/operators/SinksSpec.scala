package graft.operators

import java.nio.file.Files

import graft.SparkSuite

class SinksSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString + "/t"

  test("appendInto: create-on-first-load, then append (write_dataframe path)") {
    val path = tmp("append")
    Sinks.appendInto(spark, path, Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(spark.read.parquet(path).count() == 2, "first load dedups + creates")
    Sinks.appendInto(spark, path, Seq((3L, "c")).toDF("id", "v"))
    val t = spark.read.parquet(path)
    assert(t.count() == 3)
    assert(t.columns.contains("record_loaded_at"))
  }

  test("appendInto evolves the table on drift (added column)") {
    val path = tmp("drift")
    Sinks.appendInto(spark, path, Seq((1L, "a")).toDF("id", "v"))
    Sinks.appendInto(spark, path, Seq((2L, "b", 9.5)).toDF("id", "v", "score"))
    val t = spark.read.parquet(path)
    assert(t.columns.contains("score"))
    assert(t.where($"id" === 1L).select($"score").collect().head.isNullAt(0))
    assert(t.where($"id" === 2L).select($"score").as[Double].head() == 9.5)
  }

  test("appendInto type drift lands in the sidecar column") {
    val path = tmp("typedrift")
    Sinks.appendInto(spark, path, Seq((1L, 10)).toDF("id", "v"))
    Sinks.appendInto(spark, path, Seq((2L, "x")).toDF("id", "v"))
    val t = spark.read.parquet(path)
    assert(t.columns.contains("v_string"), t.columns.mkString(","))
    assert(t.where($"id" === 2L).select($"v_string").as[String].head() == "x")
  }

  test("handoff round-trips a stage boundary") {
    val df = Seq((1, "a")).toDF("id", "v")
    val back = Sinks.handoff(spark, df, tmp("handoff"))
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("swapInto replaces content atomically-by-rename") {
    val path = tmp("swap")
    Sinks.swapInto(spark, path, Seq((1, "old")).toDF("id", "v"))
    Sinks.swapInto(spark, path, Seq((2, "new")).toDF("id", "v"))
    assert(spark.read.parquet(path).select($"v").as[String].collect().toSeq == Seq("new"))
  }

  test("a crash between swapInto's two renames self-heals on the next WRITE") {
    val path = tmp("swapcrash")
    Sinks.swapInto(spark, path, Seq((1, "live")).toDF("id", "v"))
    // reproduce the crash window exactly: dest has been renamed to .old,
    // the staging->dest rename never happened — no live table on disk
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)), "precondition: dest gone")
    // the probe is PURE (a read-sounding call must not race a concurrent
    // writer's renames — ADVICE r4): it reports the crashed state as-is
    assert(!Sinks.tableExists(spark, path), "probe must not mutate")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path + ".old")),
      "probe must leave the backup untouched")
    // the next WRITER owns the repair: appendInto restores the backed-up
    // rows before appending, so nothing is silently dropped
    Sinks.appendInto(spark, path, Seq((2, "next")).toDF("id", "v"))
    assert(spark.read.parquet(path).select($"v").as[String].collect().toSet ==
      Set("live", "next"), "heal must restore the backup, then append")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".old")),
      ".old must be consumed by the restore")
  }

  test("swapIntoVersioned publishes via commit marker; readCurrent follows it") {
    val root = tmp("versioned")
    Sinks.swapIntoVersioned(spark, root, Seq((1, "v1")).toDF("id", "v"))
    assert(Sinks.readCurrent(spark, root).select($"v").as[String].collect().toSeq == Seq("v1"))
    Sinks.swapIntoVersioned(spark, root, Seq((2, "v2")).toDF("id", "v"))
    assert(Sinks.readCurrent(spark, root).select($"v").as[String].collect().toSeq == Seq("v2"))
  }

  test("a crash before the commit marker leaves readers on the old version") {
    val root = tmp("vcrash")
    Sinks.swapIntoVersioned(spark, root, Seq((1, "committed")).toDF("id", "v"))
    // simulate a writer that died after writing data but BEFORE the commit
    // point: a bare v-directory with no marker
    Seq((2, "torn")).toDF("id", "v")
      .write.mode("overwrite").parquet(root + "/v00000002")
    assert(Sinks.readCurrent(spark, root).select($"v").as[String].collect().toSeq ==
      Seq("committed"), "uncommitted data must be invisible")
    // the next successful swap reuses the orphan's version slot (overwrite
    // clears the torn files) and its marker makes the new data visible
    Sinks.swapIntoVersioned(spark, root, Seq((3, "v3")).toDF("id", "v"))
    assert(Sinks.readCurrent(spark, root).select($"v").as[String].collect().toSeq == Seq("v3"),
      "the orphan slot's torn files must have been overwritten by the commit")
  }

  test("a reader concurrent with repeated versioned swaps always sees a complete table") {
    // the claim swapIntoVersioned makes over rename-based swapInto: there
    // is NO instant at which a reader resolves to a missing or partial
    // table. Hammer readCurrent from a second thread while the writer
    // publishes 8 versions; every read must return a complete snapshot
    // (all rows of exactly one version), never an error or a torn set.
    // deep retention: a reader mid-scan must survive however many swaps
    // land during its read — that is exactly what keepVersions sizes
    val root = tmp("vconcurrent")
    def swap(v: Int): Unit = Sinks.swapIntoVersioned(
      spark, root, Seq((v, s"v$v"), (v, s"v$v")).toDF("ver", "tag"), keepVersions = 20)
    swap(0)
    @volatile var writerDone = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!writerDone) {
        try {
          val vers = Sinks.readCurrent(spark, root)
            .select($"tag").as[String].collect().toSeq
          if (vers.size != 2 || vers.distinct.size != 1)
            failures.add(s"torn read: $vers")
          reads.incrementAndGet()
        } catch {
          case e: Exception => failures.add(s"reader error: ${e.getMessage}")
        }
      }
    })
    reader.start()
    for (v <- 1 to 8) swap(v)
    writerDone = true
    reader.join(30000)
    assert(failures.isEmpty, s"concurrent reads failed: ${failures.toArray.mkString("; ")}")
    assert(reads.get() > 0, "the reader must have actually raced the writer")
    assert(Sinks.readCurrent(spark, root).select($"tag").as[String].collect().toSet == Set("v8"))
  }

  test("time travel: readVersion resolves retained versions, rejects GC'd ones") {
    val root = tmp("vtravel")
    (1 to 3).foreach { i =>
      Sinks.swapIntoVersioned(spark, root,
        Seq((i, s"v$i")).toDF("id", "v"), keepVersions = 3)
    }
    assert(Sinks.listVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(Sinks.readVersion(spark, root, 2L).select($"v").as[String].collect().toSeq == Seq("v2"))
    Sinks.swapIntoVersioned(spark, root, Seq((4, "v4")).toDF("id", "v"), keepVersions = 3)
    assert(Sinks.listVersions(spark, root) == Seq(2L, 3L, 4L), "v1 left the horizon")
    intercept[IllegalArgumentException] { Sinks.readVersion(spark, root, 1L) }
  }

  test("versioned retention: latest two versions kept, older GC'd") {
    val root = tmp("vgc")
    (1 to 4).foreach { i =>
      Sinks.swapIntoVersioned(spark, root, Seq((i, s"v$i")).toDF("id", "v"))
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root + "/v00000004")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root + "/v00000003")),
      "previous version stays readable for in-flight readers")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/v00000002")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/_commit_00000002")))
    assert(Sinks.readCurrent(spark, root).select($"v").as[String].collect().toSeq == Seq("v4"))
  }
}
