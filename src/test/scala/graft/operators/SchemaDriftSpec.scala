package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class SchemaDriftSpec extends SparkSuite {
  import spark.implicits._

  test("diff finds added, missing and type-changed columns") {
    val dest = StructType(Seq(
      StructField("id", LongType), StructField("v", IntegerType),
      StructField("only_dest", StringType)))
    val inc = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("added", DoubleType)))
    val r = SchemaDrift.diff(dest, inc)
    assert(r.addedColumns.map(_.name) == Seq("added"))
    assert(r.missingColumns.map(_.name) == Seq("only_dest"))
    assert(r.typeChanges.map(tc => (tc.name, tc.sidecarName)) == Seq(("v", "v_string")))
  }

  test("driftUnion: added column null-backfilled, type change lands in sidecar") {
    val a = Seq((1L, 10)).toDF("id", "v")
    val b = Seq((2L, "x", true)).toDF("id", "v", "flag")
    val out = SchemaDrift.driftUnion(a, b)
    assert(out.columns.toSeq == Seq("id", "v", "v_string", "flag"))
    val rows = out.orderBy("id").collect().map(_.toSeq)
    assert(rows(0) == Seq(1L, 10, null, null))
    assert(rows(1) == Seq(2L, null, "x", true))
  }

  test("driftUnion with identical schemas is a plain union") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    assert(SchemaDrift.driftUnion(a, b).count() == 2)
    assert(SchemaDrift.diff(a.schema, b.schema).isDrifted == false)
  }

  test("drift column-set resolution is commutative on column sets") {
    val a = Seq((1L, 10, "s")).toDF("id", "v", "s")
    val b = Seq((2L, "x", 1.5)).toDF("id", "v", "w")
    val ab = SchemaDrift.driftUnion(a, b).columns.toSet
    val ba = SchemaDrift.driftUnion(b, a).columns.toSet
    // same evolved column universe modulo which side holds the original name
    assert(ab == Set("id", "v", "v_string", "s", "w"))
    assert(ba == Set("id", "v", "v_int", "s", "w"))
  }
}
