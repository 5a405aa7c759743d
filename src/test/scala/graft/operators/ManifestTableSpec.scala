package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

class ManifestTableSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_manifest").resolve("t").toString

  private def docs(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, s"doc_$i", i * 10.0)).toDF("id", "name", "score")

  test("commit + read round-trips the batch exactly") {
    val root = freshRoot()
    val in = docs(500)
    val v = ManifestTable.commit(spark, root, in, Seq("id", "score"))
    assert(v == 1L)
    val back = ManifestTable.read(spark, root)
    // parquet round-trip relaxes nullability; names and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      in.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }

  test("append commit extends the snapshot; old version still time-travels") {
    val root = freshRoot()
    val v1 = ManifestTable.commit(spark, root, docs(100), Seq("id"))
    val v2 = ManifestTable.commit(spark, root, docs(50, from = 100), Seq("id"), append = true)
    assert(ManifestTable.listVersions(spark, root) == Seq(1L, 2L))
    assert(ManifestTable.read(spark, root, Some(v1)).count() == 100)
    assert(ManifestTable.read(spark, root, Some(v2)).count() == 150)
    assert(ManifestTable.currentVersion(spark, root) == 2L)
  }

  test("overwrite commit logically truncates but keeps history readable") {
    val root = freshRoot()
    ManifestTable.commit(spark, root, docs(100), Seq("id"))
    ManifestTable.commit(spark, root, docs(10, from = 900), Seq("id"))
    assert(ManifestTable.read(spark, root).count() == 10)
    assert(ManifestTable.read(spark, root, Some(1L)).count() == 100)
  }

  test("append with a drifted schema fails fast") {
    val root = freshRoot()
    ManifestTable.commit(spark, root, docs(10), Seq("id"))
    val drifted = docs(10, from = 10).withColumn("extra", lit(1))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, root, drifted, Seq("id"), append = true)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("scanRange prunes files by min/max stats without changing results") {
    val root = freshRoot()
    // range-cluster so each of the 8 files owns a disjoint id range
    val in = docs(4000).repartitionByRange(8, col("id")).sortWithinPartitions("id")
    ManifestTable.commit(spark, root, in, Seq("id"))
    val pruned = ManifestTable.scanRange(spark, root, "id", Some("1000"), Some("1499"))
    assert(pruned.filesTotal == 8)
    assert(pruned.filesScanned < pruned.filesTotal,
      s"expected skipping, scanned ${pruned.filesScanned}/${pruned.filesTotal}")
    val exact = pruned.df.where(col("id").between(1000, 1499))
    val full = ManifestTable.read(spark, root).where(col("id").between(1000, 1499))
    assert(exact.orderBy("id").collect().toSeq == full.orderBy("id").collect().toSeq)
    assert(exact.count() == 500)
  }

  test("scanRange skips all-null-stats files and open bounds work") {
    val root = freshRoot()
    val withNulls = Seq[(java.lang.Long, String)]((null, "a"), (null, "b"))
      .toDF("id", "name").withColumn("score", lit(null).cast("double"))
      .select(col("id").cast("long"), col("name"), col("score"))
    val typed = docs(100).unionByName(withNulls.as[(Long, String, Double)].toDF("id", "name", "score"))
    ManifestTable.commit(spark, root,
      typed.repartitionByRange(4, col("id")).sortWithinPartitions("id"), Seq("id"))
    val open = ManifestTable.scanRange(spark, root, "id", Some("50"), None)
    val got = open.df.where(col("id") >= 50)
    assert(got.count() == 50)
  }

  test("changes between appends yields exactly the added rows") {
    val root = freshRoot()
    val v1 = ManifestTable.commit(spark, root, docs(100), Seq("id"))
    val v2 = ManifestTable.commit(spark, root, docs(30, from = 100), Seq("id"), append = true)
    val v3 = ManifestTable.commit(spark, root, docs(20, from = 130), Seq("id"), append = true)
    val delta = ManifestTable.changes(spark, root, v1, v3)
    assert(delta.agg(min("id"), max("id"), count(lit(1))).collect().head ==
      Row(100L, 149L, 50L))
    assert(ManifestTable.changes(spark, root, v2, v3).count() == 20)
  }

  test("changes across an overwrite fails fast") {
    val root = freshRoot()
    val v1 = ManifestTable.commit(spark, root, docs(10), Seq("id"))
    ManifestTable.commit(spark, root, docs(5), Seq("id")) // overwrite
    val v3 = ManifestTable.commit(spark, root, docs(5, from = 5), Seq("id"), append = true)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.changes(spark, root, v1, v3)
    }
    assert(e.getMessage.contains("non-append"))
  }

  test("crashed commit (data written, manifest never published) is invisible and vacuumed") {
    val root = freshRoot()
    ManifestTable.commit(spark, root, docs(100), Seq("id"))
    // simulate a crash: batch dir for v2 exists, no manifest-00000002.json
    docs(10, from = 100).write.parquet(s"$root/data/b00000002")
    assert(ManifestTable.currentVersion(spark, root) == 1L)
    assert(ManifestTable.read(spark, root).count() == 100)
    ManifestTable.vacuum(spark, root, keepVersions = 2)
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/data/b00000002")))
    assert(ManifestTable.read(spark, root).count() == 100)
  }

  test("vacuum drops history outside retention but keeps shared files of retained versions") {
    val root = freshRoot()
    ManifestTable.commit(spark, root, docs(100), Seq("id"))               // v1
    ManifestTable.commit(spark, root, docs(30, from = 100), Seq("id"), append = true) // v2
    ManifestTable.commit(spark, root, docs(20, from = 130), Seq("id"), append = true) // v3
    ManifestTable.vacuum(spark, root, keepVersions = 2)
    assert(ManifestTable.listVersions(spark, root) == Seq(2L, 3L))
    // v2 and v3 still read fully: v1's files are SHARED into them and must survive
    assert(ManifestTable.read(spark, root, Some(2L)).count() == 130)
    assert(ManifestTable.read(spark, root, Some(3L)).count() == 150)
    intercept[IllegalArgumentException] {
      ManifestTable.read(spark, root, Some(1L))
    }
  }

  test("compact merges small files into a new snapshot, preserves rows and skipping") {
    val root = freshRoot()
    // three append commits -> many small files
    ManifestTable.commit(spark, root,
      docs(1000).repartitionByRange(4, col("id")).sortWithinPartitions("id"), Seq("id"))
    ManifestTable.commit(spark, root,
      docs(1000, from = 1000).repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      Seq("id"), append = true)
    val before = ManifestTable.scanRange(spark, root, "id", Some("0"), Some("10"))
    val v = ManifestTable.compact(spark, root, targetBytes = 10L * 1024 * 1024)
    val after = ManifestTable.scanRange(spark, root, "id", Some("0"), Some("10"))
    assert(ManifestTable.read(spark, root).count() == 2000)
    assert(after.filesTotal < before.filesTotal,
      s"expected fewer files after compaction: ${after.filesTotal} vs ${before.filesTotal}")
    assert(after.df.where(col("id") <= 10).count() == 11)
    // pre-compaction snapshot still time-travels
    assert(ManifestTable.read(spark, root, Some(v - 1)).count() == 2000)
  }

  test("statsDrift reads two snapshots' health from manifests alone") {
    val root = freshRoot()
    val v1 = ManifestTable.commit(spark, root, docs(100), Seq("id", "score"))
    val withNulls = docs(50, from = 100)
      .withColumn("score", when(col("id") % 2 === 0, col("score")))
    val v2 = ManifestTable.commit(spark, root, withNulls, Seq("id", "score"), append = true)
    val drift = ManifestTable.statsDrift(spark, root, v1, v2)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = drift("score")
    assert(s.getLong(1) == 100L && s.getLong(2) == 150L, "row counts")
    assert(s.getLong(3) == 0L && s.getLong(4) == 25L, s"null drift: $s")
    val i = drift("id")
    assert(i.getString(5) == "0" && i.getString(6) == "0", "min id stable")
    assert(BigDecimal(i.getString(8)) == BigDecimal(149), s"max id advanced: $i")
  }

  test("concurrent append commits: distinct versions, no batch lost, no row duplicated") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val root = freshRoot()
    ManifestTable.commit(spark, root, docs(10), Seq("id"))
    val racers = (0 until 4).map { i =>
      Future {
        ManifestTable.commit(spark, root, docs(10, from = 10 + i * 10),
          Seq("id"), append = true, maxRetries = 50)
      }
    }
    val versions = Await.result(Future.sequence(racers), 180.seconds)
    assert(versions.toSet.size == 4, s"each racer its own version: $versions")
    val finalTable = ManifestTable.read(spark, root)
    assert(finalTable.count() == 50, "every batch must land in the final snapshot")
    assert(finalTable.select("id").distinct().count() == 50, "no row duplicated")
    // every racer's snapshot contains its own batch plus all predecessors'
    versions.sorted.zipWithIndex.foreach { case (v, i) =>
      assert(ManifestTable.read(spark, root, Some(v)).count() >= 10L * (i + 2),
        s"version $v dropped a predecessor's files")
    }
  }

  test("manifest stats carry portable timestamp min/max that prune date ranges") {
    val root = freshRoot()
    val ts = (0 until 365).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00").toInstant
        .plusSeconds(d.toLong * 86400).toString.replace("T", " ").replace("Z", ""))
    }.toDF("id", "ts_str")
      .select(col("id"), to_timestamp(col("ts_str")).as("ts"))
      .repartitionByRange(6, col("ts")).sortWithinPartitions("ts")
    ManifestTable.commit(spark, root, ts, Seq("ts"))
    val pruned = ManifestTable.scanRange(spark, root, "ts",
      Some("2024-06-01 00:00:00"), Some("2024-06-30 23:59:59"))
    assert(pruned.filesScanned < pruned.filesTotal)
    assert(pruned.df.where(col("ts") >= "2024-06-01" && col("ts") < "2024-07-01").count() == 30)
  }
}
