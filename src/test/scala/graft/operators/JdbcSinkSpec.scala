package graft.operators

import graft.SparkSuite

/** JDBC sink paths against embedded Derby (the JDBC engine available
  * offline) — exercises the same create/append/drift/merge branches
  * SinksSpec covers for parquet.
  */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString
  private def conn(name: String) =
    JdbcSink.Conn(url = s"jdbc:derby:$dbDir/$name;create=true")

  test("appendInto: create-on-first-load, then append") {
    val c = conn("db1")
    assert(!JdbcSink.tableExists(c, "movies"))
    JdbcSink.appendInto(spark, c, "movies",
      Seq((1L, "Alpha", 7.5), (2L, "Beta", 6.0)).toDF("id", "title", "score"))
    assert(JdbcSink.tableExists(c, "movies"))
    val first = JdbcSink.read(spark, c, "movies")
    assert(first.count() == 2)
    assert(first.columns.contains(Audit.ColumnName))

    JdbcSink.appendInto(spark, c, "movies",
      Seq((3L, "Gamma", 8.1)).toDF("id", "title", "score"))
    assert(JdbcSink.read(spark, c, "movies").count() == 3)
  }

  test("appendInto evolves the table on drift (added column)") {
    val c = conn("db2")
    JdbcSink.appendInto(spark, c, "movies",
      Seq((1L, "Alpha")).toDF("id", "title"))
    JdbcSink.appendInto(spark, c, "movies",
      Seq((2L, "Beta", 6.0)).toDF("id", "title", "score"))
    val out = JdbcSink.read(spark, c, "movies")
    assert(out.count() == 2)
    assert(out.columns.contains("score"))
    // pre-drift row got a NULL in the new column
    assert(out.where("id = 1 AND score IS NULL").count() == 1)
  }

  test("mergeInto: update changed, insert new, keep unchanged") {
    val c = conn("db3")
    JdbcSink.mergeInto(spark, c, "movies",
      Seq((1L, "Alpha", 7.5), (2L, "Beta", 6.0)).toDF("id", "title", "score"),
      pk = Seq("id"), orderCols = Seq("score"))
    // update id=2, insert id=3, resend id=1 unchanged
    JdbcSink.mergeInto(spark, c, "movies",
      Seq((1L, "Alpha", 7.5), (2L, "Beta", 9.9), (3L, "Gamma", 8.1))
        .toDF("id", "title", "score"),
      pk = Seq("id"), orderCols = Seq("score"))
    val out = JdbcSink.read(spark, c, "movies")
      .select("id", "title", "score").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "Alpha", 7.5), (2L, "Beta", 9.9), (3L, "Gamma", 8.1)))
  }

  test("swapInto replaces the table atomically-by-rename") {
    val c = conn("db4")
    JdbcSink.appendInto(spark, c, "t",
      Seq((1L, "old")).toDF("id", "v"))
    JdbcSink.swapInto(spark, c, "t", Seq((2L, "new"), (3L, "new")).toDF("id", "v"))
    val out = JdbcSink.read(spark, c, "t")
    assert(out.count() == 2)
    assert(out.where("v = 'old'").count() == 0)
    assert(!JdbcSink.tableExists(c, "t__staging"))
  }
}
