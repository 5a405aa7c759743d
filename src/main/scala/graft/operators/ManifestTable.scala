package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-backed table format: multi-file ATOMIC commits, snapshot
  * time travel over SHARED immutable data files, per-file min/max stats
  * for planning-time file skipping, and an incremental changes feed —
  * the transactional-log ideas of Delta/Iceberg (re-expressed from
  * scratch on `FileSystem` + parquet; the reference's warehouse tables
  * get the same guarantees from Postgres, themovies.py:16-150).
  *
  * Layout:
  * {{{
  * tableRoot/
  *   data/b-3f9a1c.../part-*.parquet (immutable; never rewritten)
  *   data/b-87be22.../part-*.parquet
  *   claim-00000001                  (version fence; zero bytes)
  *   manifest-00000001.json          (snapshot: file list + stats)
  *   manifest-00000002.json          (append: first batch + second)
  * }}}
  *
  * COMMIT POINT: the manifest file appears via write-temp-then-rename —
  * a single atomic rename, so a reader resolving the latest manifest
  * sees either the old snapshot or the new one, never a partial table.
  * Unlike [[Sinks.swapIntoVersioned]] (which copies the full table per
  * version), appends here add only the new files: snapshot N+1's
  * manifest references snapshot N's files in place, so time travel and
  * retention are metadata-only until [[vacuum]].
  *
  * 100 TB design: data files are immutable and shared across snapshots
  * (an append commit writes only the batch); per-file stats are
  * collected with ONE partial-agg pass over the just-written batch
  * (`groupBy(input_file_name())` — the driver holds one row per file,
  * same cardinality as the manifest itself); [[scanRange]] prunes files
  * on the DRIVER from manifest stats before Spark ever lists or opens
  * them, which is what makes a needle query on a 100 TB range-clustered
  * table read MB not TB. CONCURRENT writers are safe: version numbers
  * are fenced by an atomic create-exclusive claim file and commit()
  * retries allocation on a lost race (appends re-base onto the winner's
  * snapshot) — run [[vacuum]] from one coordinator, though, since it
  * deletes what nothing retained references.
  */
object ManifestTable {

  final case class ColStats(min: Option[String], max: Option[String], nulls: Long)
  final case class FileEntry(path: String, rows: Long, bytes: Long,
      stats: Map[String, ColStats])
  final case class Manifest(version: Long, mode: String, schemaDdl: String,
      statsCols: Seq[String], files: Seq[FileEntry])

  /** Pruned scan result: the superset DataFrame plus the skip evidence
    * (specs and plan audits assert `filesScanned < filesTotal`).
    */
  final case class PrunedScan(df: DataFrame, filesScanned: Int, filesTotal: Int)

  private val ManifestPrefix = "manifest-"
  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: Path, v: Long): Path =
    new Path(root, f"$ManifestPrefix$v%08d.json")

  private def committedVersions(f: FileSystem, root: Path): Seq[Long] =
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && n.endsWith(".json") && !n.endsWith(".tmp"))
      .map(_.stripPrefix(ManifestPrefix).stripSuffix(".json").toLong)

  private val ClaimPrefix = "claim-"

  private def claimPath(root: Path, v: Long): Path =
    new Path(root, f"$ClaimPrefix$v%08d")

  private def claimedVersions(f: FileSystem, root: Path): Seq[Long] =
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ClaimPrefix))
      .map(_.stripPrefix(ClaimPrefix).toLong)

  def listVersions(spark: SparkSession, tableRoot: String): Seq[Long] =
    committedVersions(fs(spark), new Path(tableRoot)).sorted

  def currentVersion(spark: SparkSession, tableRoot: String): Long = {
    val vs = committedVersions(fs(spark), new Path(tableRoot))
    require(vs.nonEmpty, s"no committed snapshot under $tableRoot")
    vs.max
  }

  // ------------------------------------------------------------- commit

  /** Commit a batch as the next snapshot. `append = false` replaces the
    * table's file list with the batch's files (logical truncate — prior
    * files stay on disk for time travel until [[vacuum]]); `append = true`
    * extends the parent snapshot's list, with a strict schema check (the
    * drift-tolerant path is [[Sinks.appendInto]]; a transactional table's
    * schema evolves by explicit DDL, not silently per batch).
    *
    * CONCURRENT writers are safe: version allocation retries on a lost
    * manifest rename (appends re-base onto the winner; see the commit
    * body). Returns the committed version number.
    */
  def commit(spark: SparkSession, tableRoot: String, batch: DataFrame,
      statsCols: Seq[String] = Seq.empty, append: Boolean = false,
      maxRetries: Int = 5): Long = {
    val f = fs(spark)
    val root = new Path(tableRoot)
    // nullability normalized away: parquet does not round-trip NOT NULL,
    // so two batches of identical data can disagree on it spuriously
    val schemaDdl = StructType(batch.schema.fields.map(_.copy(nullable = true))).toDDL
    statsCols.foreach { c =>
      val dt = batch.schema(c).dataType
      require(statsComparable(dt), s"stats column $c has unsupported type $dt " +
        "(numeric, string, date and timestamp min/max order is portable; others are not)")
    }

    // Batch dir names carry a NONCE, not the version: the data write
    // happens before version allocation and can never collide with a
    // concurrent writer's, so the manifest rename below is the only race
    // point — which is what makes it retryable (optimistic concurrency,
    // the Delta commit-protocol shape). Data is written exactly once;
    // only the metadata loop repeats. A crashed attempt leaves an
    // unreferenced dir for [[vacuum]].
    val batchRel = s"data/b-${java.util.UUID.randomUUID.toString.take(12)}"
    val batchDir = new Path(root, batchRel)
    batch.write.mode("overwrite").parquet(batchDir.toString)
    val newEntries = collectFileStats(spark, f, batchDir, batchRel, statsCols)

    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      // allocate over PUBLISHED and CLAIMED versions: a crashed writer's
      // claim burns its number (readers never see it — no manifest), and
      // live racers are fenced by the claim itself
      val next = math.max(committedVersions(f, root).maxOption.getOrElse(0L),
        claimedVersions(f, root).maxOption.getOrElse(0L)) + 1L

      // Version CLAIM: a zero-byte create(overwrite = false) — the one
      // primitive that is atomic-exclusive on local, HDFS and object-store
      // FileSystems alike (bare rename clobbers on POSIX, so it cannot be
      // the fence). The claim winner owns the version number; the rename
      // below then targets a name no live writer competes for, and a
      // reader sees the manifest only complete (rename is atomic).
      val won =
        try { f.create(claimPath(root, next), false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!won) {
        require(attempt <= maxRetries,
          s"commit lost the version race $maxRetries times under $root - " +
            "persistent writer contention; coordinate writers or raise maxRetries")
      } else {
        // The parent snapshot is read ONLY NOW — after the claim, and
        // after the previous claimant either publishes or is declared
        // crashed (claim without manifest past the wait): reading it any
        // earlier could re-base an append onto a stale parent and silently
        // drop a concurrent writer's files. A genuinely live-but-slower
        // predecessor is indistinguishable from a crashed one on a bare
        // FileSystem (the reason Delta-on-S3 grew a lock service); the
        // wait bounds that window, it cannot close it.
        if (next > 1 && f.exists(claimPath(root, next - 1))) {
          val deadline = System.currentTimeMillis() + parentWaitMs
          while (!f.exists(manifestPath(root, next - 1)) &&
            System.currentTimeMillis() < deadline) Thread.sleep(20)
        }
        val parentV = committedVersions(f, root).maxOption
        val parent = parentV.map(v => loadManifest(f, root, v))
        parent.filter(_ => append).foreach { p =>
          require(p.schemaDdl == schemaDdl,
            s"append schema mismatch: table is <${p.schemaDdl}>, batch is <$schemaDdl>")
          require(statsCols == p.statsCols,
            s"append stats columns mismatch: table tracks ${p.statsCols}, batch asked for $statsCols")
        }
        val files = if (append) parent.map(_.files).getOrElse(Seq.empty) ++ newEntries
        else newEntries
        val m = Manifest(next, if (append) "append" else "overwrite",
          schemaDdl, statsCols, files)
        val tmp = new Path(root, s"${ManifestPrefix}tmp-${batchRel.stripPrefix("data/")}.json.tmp")
        val out = f.create(tmp, true)
        out.write(renderManifest(m).getBytes(StandardCharsets.UTF_8))
        out.close()
        val dest = manifestPath(root, next)
        require(f.rename(tmp, dest), s"claimed version $next but failed to publish $dest")
        committed = next
      }
    }
    committed
  }

  /** How long a claim winner waits for its predecessor claimant to
    * publish before declaring the number burned (crashed writer).
    */
  private val parentWaitMs = 30000L

  /** One partial-agg pass over the just-written batch: per-file row
    * counts and min/max/null-count for the stats columns. Driver
    * materializes exactly one row per data file — the same cardinality
    * the manifest stores, so this collect is bounded by the manifest
    * size itself.
    */
  private def collectFileStats(spark: SparkSession, f: FileSystem,
      batchDir: Path, batchRel: String, statsCols: Seq[String]): Seq[FileEntry] = {
    val written = spark.read.parquet(batchDir.toString)
    val aggs = count(lit(1)).as("__rows") +: statsCols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
    }
    val perFile = written.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val sizes: Map[String, Long] = f.listStatus(batchDir).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    perFile.toSeq.map { r =>
      val name = new Path(r.getAs[String]("__file")).getName
      val stats = statsCols.map { c =>
        c -> ColStats(
          Option(r.getAs[String](s"__min_$c")),
          Option(r.getAs[String](s"__max_$c")),
          r.getAs[Long](s"__nulls_$c"))
      }.toMap
      FileEntry(s"$batchRel/$name", r.getAs[Long]("__rows"),
        sizes.getOrElse(name, 0L), stats)
    }.sortBy(_.path)
  }

  // --------------------------------------------------------------- read

  /** Read a snapshot (latest by default) from its EXPLICIT manifest file
    * list — no directory listing on the read path, so a 100 TB table's
    * read planning cost is the manifest, not a recursive namespace walk.
    */
  def read(spark: SparkSession, tableRoot: String, version: Option[Long] = None): DataFrame = {
    val f = fs(spark)
    val root = new Path(tableRoot)
    val m = resolve(f, root, version)
    dfFor(spark, root, m, m.files)
  }

  private def resolve(f: FileSystem, root: Path, version: Option[Long]): Manifest = {
    val vs = committedVersions(f, root)
    require(vs.nonEmpty, s"no committed snapshot under $root")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v),
      s"version $v not committed under $root (retained: ${vs.sorted.mkString(", ")})")
    loadManifest(f, root, v)
  }

  private def dfFor(spark: SparkSession, root: Path, m: Manifest,
      files: Seq[FileEntry]): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema).parquet(files.map(fe => new Path(root, fe.path).toString): _*)
  }

  /** File-skipping range scan: drop every file whose manifest [min,max]
    * for `colName` cannot intersect [lower, upper] — decided on the
    * driver from stats alone, before any file is opened. Bounds are in
    * the stats' portable string form (numbers as decimal strings,
    * timestamps as `yyyy-MM-dd HH:mm:ss[.f]`); `None` means unbounded on
    * that side. Returns the SUPERSET DataFrame (callers apply the exact
    * predicate; pruning never changes results, only file count) plus the
    * skip evidence. All-null files are skipped: a range predicate cannot
    * match NULL.
    */
  def scanRange(spark: SparkSession, tableRoot: String, colName: String,
      lower: Option[String], upper: Option[String],
      version: Option[Long] = None): PrunedScan = {
    val f = fs(spark)
    val root = new Path(tableRoot)
    val m = resolve(f, root, version)
    require(m.statsCols.contains(colName),
      s"no stats collected for $colName (have: ${m.statsCols.mkString(", ")})")
    val dt = StructType.fromDDL(m.schemaDdl)(colName).dataType
    val kept = m.files.filter { fe =>
      fe.stats.get(colName) match {
        case Some(ColStats(Some(mn), Some(mx), _)) =>
          lower.forall(lo => cmp(dt, mx, lo) >= 0) &&
            upper.forall(up => cmp(dt, mn, up) <= 0)
        case _ => false // all-null (or statless) file: BETWEEN can't match
      }
    }
    PrunedScan(dfFor(spark, root, m, kept), kept.size, m.files.size)
  }

  private def statsComparable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Order over the portable string form: numerics re-parsed exactly;
    * strings/dates/timestamps lexicographic (ISO renderings sort
    * chronologically).
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case _: NumericType => BigDecimal(a).compare(BigDecimal(b))
    case _ => a.compareTo(b)
  }

  // ------------------------------------------------------------ changes

  /** Incremental consumption: the rows ADDED between two snapshots =
    * exactly the data files present in `toVersion`'s manifest but not in
    * `fromVersion`'s. Well-defined only across append commits (an
    * overwrite in the range rewrites history — fails fast), so a
    * downstream incremental job can checkpoint a version number and read
    * just the delta, never rescanning the base table
    * (the batch analog of [[IncrementalAgg]]'s streaming refresh).
    */
  def changes(spark: SparkSession, tableRoot: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val f = fs(spark)
    val root = new Path(tableRoot)
    require(fromVersion < toVersion, s"need fromVersion < toVersion, got $fromVersion >= $toVersion")
    val from = resolve(f, root, Some(fromVersion))
    val to = resolve(f, root, Some(toVersion))
    committedVersions(f, root).filter(v => v > fromVersion && v <= toVersion)
      .foreach { v =>
        val mode = loadManifest(f, root, v).mode
        require(mode == "append",
          s"changes($fromVersion, $toVersion) crosses a non-append commit at v$v ($mode)")
      }
    val base = from.files.map(_.path).toSet
    dfFor(spark, root, to, to.files.filterNot(fe => base(fe.path)))
  }

  // ------------------------------------------------------------- vacuum

  /** Retention: keep the newest `keepVersions` manifests, delete older
    * ones, then delete every data file referenced by NO retained
    * manifest — including batch dirs of crashed commits (data written,
    * manifest never published). Run by the single writer (so no commit
    * is in flight); size `keepVersions` to cover the longest concurrent
    * reader scan, as with [[Sinks.swapIntoVersioned]].
    */
  def vacuum(spark: SparkSession, tableRoot: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val f = fs(spark)
    val root = new Path(tableRoot)
    val vs = committedVersions(f, root).sorted
    val keep = vs.takeRight(keepVersions).toSet
    val referenced: Set[String] = keep.flatMap(v => loadManifest(f, root, v).files.map(_.path))
    vs.filterNot(keep).foreach(v => f.delete(manifestPath(root, v), false))
    // claims of non-retained versions (incl. burned numbers below the
    // horizon) and orphaned manifest tmp files from crashed publishes
    claimedVersions(f, root).filter(_ < keep.minOption.getOrElse(Long.MaxValue))
      .foreach(v => f.delete(claimPath(root, v), false))
    f.listStatus(root).filter(_.getPath.getName.endsWith(".json.tmp"))
      .foreach(st => f.delete(st.getPath, false))
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { bdir =>
      val rel = s"data/${bdir.getPath.getName}"
      f.listStatus(bdir.getPath).foreach { st =>
        val fileRel = s"$rel/${st.getPath.getName}"
        if (st.getPath.getName.endsWith(".parquet") && !referenced(fileRel))
          f.delete(st.getPath, false)
      }
      if (f.listStatus(bdir.getPath).forall(s => !s.getPath.getName.endsWith(".parquet")))
        f.delete(bdir.getPath, true)
    }
  }

  // -------------------------------------------------------- maintenance

  /** Small-file compaction as a NEW overwrite commit: reads the current
    * snapshot, re-clusters it on the first stats column (compaction must
    * not destroy the min/max locality that [[scanRange]] skipping paid
    * for) into ceil(total/targetBytes) files, and commits. History stays
    * readable — the pre-compaction snapshot and its small files survive
    * until [[vacuum]] retires them. Returns the new version.
    */
  def compact(spark: SparkSession, tableRoot: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val f = fs(spark)
    val root = new Path(tableRoot)
    val m = resolve(f, root, None)
    val total = m.files.map(_.bytes).sum
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = dfFor(spark, root, m, m.files)
    val clustered = m.statsCols.headOption match {
      case Some(c) => df.repartitionByRange(parts, col(c)).sortWithinPartitions(c)
      case None => df.repartition(parts)
    }
    commit(spark, tableRoot, clustered, m.statsCols)
  }

  /** Metadata-only snapshot comparison — the pipeline-health check that
    * costs ZERO table IO: per stats column, row/null counts and min/max
    * of two snapshots, straight from their manifests. A nightly load
    * whose null rate doubles or whose key range collapses is caught here
    * before anything downstream scans it.
    */
  def statsDrift(spark: SparkSession, tableRoot: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val f = fs(spark)
    val root = new Path(tableRoot)
    val from = resolve(f, root, Some(fromVersion))
    val to = resolve(f, root, Some(toVersion))
    val dt = StructType.fromDDL(to.schemaDdl)
    def rollup(m: Manifest, c: String): (Long, Long, Option[String], Option[String]) = {
      val ss = m.files.flatMap(_.stats.get(c))
      val mins = ss.flatMap(_.min)
      val maxs = ss.flatMap(_.max)
      (m.files.map(_.rows).sum, ss.map(_.nulls).sum,
        if (mins.isEmpty) None else Some(mins.min(Ordering.fromLessThan[String](cmp(dt(c).dataType, _, _) < 0))),
        if (maxs.isEmpty) None else Some(maxs.max(Ordering.fromLessThan[String](cmp(dt(c).dataType, _, _) < 0))))
    }
    val cols = from.statsCols.intersect(to.statsCols)
    val rows = cols.map { c =>
      val (rf, nf, mnf, mxf) = rollup(from, c)
      val (rt, nt, mnt, mxt) = rollup(to, c)
      Row(c, rf, rt, nf, nt, mnf.orNull, mnt.orNull, mxf.orNull, mxt.orNull)
    }
    val schema = StructType(Seq(
      StructField("column", StringType), StructField("rows_from", LongType),
      StructField("rows_to", LongType), StructField("nulls_from", LongType),
      StructField("nulls_to", LongType), StructField("min_from", StringType),
      StructField("min_to", StringType), StructField("max_from", StringType),
      StructField("max_to", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  // ----------------------------------------------------- (de)serialize

  private def renderManifest(m: Manifest): String = {
    val o = mapper.createObjectNode()
    o.put("version", m.version)
    o.put("mode", m.mode)
    o.put("schemaDdl", m.schemaDdl)
    val sc = o.putArray("statsCols"); m.statsCols.foreach(sc.add)
    val fa = o.putArray("files")
    m.files.foreach { fe =>
      val fo = fa.addObject()
      fo.put("path", fe.path); fo.put("rows", fe.rows); fo.put("bytes", fe.bytes)
      val so = fo.putObject("stats")
      fe.stats.toSeq.sortBy(_._1).foreach { case (c, s) =>
        val co = so.putObject(c)
        s.min.fold[Unit] { co.putNull("min"); () } { v => co.put("min", v); () }
        s.max.fold[Unit] { co.putNull("max"); () } { v => co.put("max", v); () }
        co.put("nulls", s.nulls)
      }
    }
    o.toPrettyString
  }

  private def loadManifest(f: FileSystem, root: Path, v: Long): Manifest = {
    val in = f.open(manifestPath(root, v))
    val node = try mapper.readTree(in) finally in.close()
    def arr(n: JsonNode): Seq[JsonNode] = {
      val b = new ArrayBuffer[JsonNode](n.size()); n.forEach(e => b += e); b.toSeq
    }
    Manifest(
      node.get("version").asLong(),
      node.get("mode").asText(),
      node.get("schemaDdl").asText(),
      arr(node.get("statsCols")).map(_.asText()),
      arr(node.get("files")).map { fn =>
        val statsNode = fn.get("stats").asInstanceOf[ObjectNode]
        val stats = {
          val b = Map.newBuilder[String, ColStats]
          statsNode.fieldNames().forEachRemaining { c =>
            val s = statsNode.get(c)
            b += c -> ColStats(
              if (s.get("min").isNull) None else Some(s.get("min").asText()),
              if (s.get("max").isNull) None else Some(s.get("max").asText()),
              s.get("nulls").asLong())
          }
          b.result()
        }
        FileEntry(fn.get("path").asText(), fn.get("rows").asLong(),
          fn.get("bytes").asLong(), stats)
      })
  }
}
