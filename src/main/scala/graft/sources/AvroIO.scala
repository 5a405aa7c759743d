package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink WITHOUT the `spark-avro` DataSource
  * connector — this environment ships the Avro serialization library
  * (`/opt/spark/jars/avro-1.12.1.jar`) but not the connector, so
  * `spark.read.format("avro")` cannot resolve. The lake format still
  * matters (Kafka landing zones and legacy pipelines hand off Avro), so
  * the IO rides the library directly on the standard distributed seam:
  *
  *  - WRITE: one Avro container file per partition, each task streaming
  *    its rows through a `DataFileWriter` straight to the destination
  *    FileSystem — executor fan-out, no driver collect, no re-shuffle.
  *  - READ: the driver lists `*.avro` once (header of ONE file infers
  *    the schema), then one task per file group streams records through
  *    `DataFileStream` — the same file-parallel shape as a parquet scan,
  *    so a 1000-file landing zone reads with 1000-way parallelism.
  *
  * Type surface (both directions): boolean/int/long/float/double/
  * string/binary, DATE (`int` + `date` logical type), TIMESTAMP
  * (`long` + `timestamp-micros`), nullable columns as
  * `union(null, T)`, and arrays of the primitive types. Decimals and
  * nested records are out of scope — the tables this engine round-trips
  * are flat; extend the two `toAvro`/`toSpark` folds if needed.
  *
  * Correctness economics: schema travels as its canonical JSON string
  * (Avro `Schema` is not serializable), parsed once per task; writer
  * tasks are independent and idempotent per partition file, so a retried
  * task overwrites its own file and nothing else.
  */
object AvroIO {

  // ---------------------------------------------------------- schemas

  /** Spark -> Avro schema. Field order is preserved; every nullable
    * Spark column becomes `union(null, T)` with null first (the Avro
    * convention that lets a record omit it).
    */
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val t = toAvroType(f.dataType)
      if (f.nullable)
        fs.name(f.name).`type`(Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), t).asJava)).withDefault(null)
      else fs.name(f.name).`type`(t).noDefault()
    }.endRecord()
  }

  private def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val e = toAvroType(et)
      Schema.createArray(if (containsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava) else e)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not map $other (flat primitives, date/timestamp and arrays only)")
  }

  /** Avro -> Spark schema (the inverse fold, for schema inference). */
  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(branches.size == 1,
        s"only union(null, T) is supported, got ${s.getTypes.asScala.map(_.getType)}")
      (toSparkType(branches.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        (DateType, false) else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName.startsWith("timestamp"))
        (TimestampType, false) else (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, en), false)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not map Avro $other")
  }

  // ------------------------------------------------------------ write

  /** Write `df` as Avro container files, one per partition (empty
    * partitions still emit a schema-only file, so a later read never
    * loses the schema). Overwrites `path`.
    *
    * Each task streams to a per-ATTEMPT hidden temp file and renames the
    * complete container into place — a speculative or zombie attempt
    * overlapping a retry of the same partition can therefore never
    * interleave bytes into a committed file; the FIRST complete rename
    * wins and a later sibling's duplicate is dropped (on POSIX-overwrite
    * local FS a later rename may still replace the file — either way any
    * renamed container is complete). Filesystems resolve from the target
    * path's own scheme, so a
    * `file://` or `s3a://` destination works under any `fs.defaultFS`.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val avroJson = toAvroSchema(df.schema).toString
    val sparkSchema = df.schema
    val dir = new Path(path)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(dir)) f.delete(dir, true)
    f.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val dest = new Path(path, f"part-$pid%05d.avro")
      val fs = dest.getFileSystem(conf.value)
      val ctx = Option(org.apache.spark.TaskContext.get())
      val attempt = ctx.map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new Path(path, f".part-$pid%05d-$attempt%d.avro.tmp")
      // a failed/killed attempt must not leak its temp file: rename on
      // success is the only other deletion path
      ctx.foreach(_.addTaskFailureListener(
        new org.apache.spark.util.TaskFailureListener {
          override def onTaskFailure(c: org.apache.spark.TaskContext,
              e: Throwable): Unit =
            try { if (fs.exists(tmp)) fs.delete(tmp, false) }
            catch { case _: Throwable => () }
        }))
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, fs.create(tmp, true))
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (fld, i) =>
          rec.put(fld.name,
            if (row.isNullAt(i)) null else toAvroValue(fld.dataType, row.get(i)))
        }
        w.append(rec)
      }
      w.close()
      // commit: rename the intact container in — never an in-place
      // stream, and never delete-then-rename: a dest can ONLY exist
      // because a sibling attempt already renamed ITS complete
      // container in (rename is the sole path to dest, and the whole
      // dir was cleared before the job), so pre-deleting it opens a
      // window where this attempt dies after the delete and the
      // partition's output is silently lost even though the sibling
      // already reported success. If our rename fails on an existing
      // dest, ours is the benign duplicate — drop the temp and succeed.
      if (!fs.rename(tmp, dest)) {
        if (fs.exists(dest)) {
          try { if (fs.exists(tmp)) fs.delete(tmp, false) }
          catch { case _: Throwable => () }
        } else {
          throw new java.io.IOException(s"AvroIO: rename $tmp -> $dest failed")
        }
      }
      Iterator.single(1)
    }.count()
    // a fully-empty input plans zero partitions and writes zero files;
    // emit one schema-only container so a later read keeps the schema
    if (!f.listStatus(dir).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, f.create(new Path(dir, "part-00000.avro"), true))
      w.close()
    }
  }

  private def toAvroValue(dt: DataType, v: Any): Any = dt match {
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case DateType => v match { // java.sql vs java.time rides session config
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
    }
    case TimestampType => v match {
      case ts: java.sql.Timestamp =>
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + (ts.getNanos / 1000L)
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    case ShortType => v.asInstanceOf[Short].toInt
    case ByteType => v.asInstanceOf[Byte].toInt
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => if (e == null) null else toAvroValue(et, e)).asJava
    case _ => v
  }

  // ------------------------------------------------------------- read

  /** Read an Avro directory (or single file). Schema comes from the
    * header of the first file unless given; files fan out one task
    * each, the parquet-scan parallelism shape.
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      (if (f.getFileStatus(p).isDirectory) f.listStatus(p).toSeq.map(_.getPath)
       else Seq(p))
        .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val sparkSchema = schema.getOrElse {
      val in = f.open(new Path(files.head))
      val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try toSparkSchema(s.getSchema) finally s.close()
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fieldTypes = sparkSchema.fields.map(fl => fl.name -> fl.dataType)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .mapPartitions { paths =>
        paths.flatMap { file =>
          val fp = new Path(file)
          val st = new DataFileStream(fp.getFileSystem(conf.value).open(fp),
            new GenericDatumReader[GenericRecord]())
          // STREAM records — a multi-GB container must not materialize
          // in one task's heap. The stream closes on exhaustion; an
          // abandoned task leaks at most one stream until executor
          // teardown (the trade every lazy file iterator makes).
          new Iterator[Row] {
            private var open = true
            override def hasNext: Boolean = {
              if (open && !st.hasNext) { st.close(); open = false }
              open
            }
            override def next(): Row = {
              if (!hasNext) throw new NoSuchElementException(file)
              val rec = st.next()
              Row.fromSeq(fieldTypes.toIndexedSeq.map { case (n, dt) =>
                val v = rec.get(n)
                if (v == null) null else toSparkValue(dt, v)
              })
            }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  private def toSparkValue(dt: DataType, v: Any): Any = dt match {
    case StringType => v.toString // Avro Utf8 -> String
    case BinaryType =>
      val bb = v.asInstanceOf[ByteBuffer]
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case DateType =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong))
    case TimestampType =>
      val micros = v.asInstanceOf[Long]
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case ArrayType(et, _) =>
      v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
        .map(e => if (e == null) null else toSparkValue(et, e))
    case _ => v
  }
}
