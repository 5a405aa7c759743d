package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VectorFunctions

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("native cosine is bit-equal to the functions composition") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ida" < $"idb").limit(2000)
    val mismatches = pairs.select(
      VectorExpressions.cosine($"va", $"vb").as("native"),
      VectorFunctions.cosine($"va", $"vb").as("composed"))
      .where($"native" =!= $"composed")
      .count()
    assert(mismatches == 0, "sequential double accumulation must match exactly")
  }

  test("SQL surface: cosine_similarity registered via SparkSessionExtensions") {
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("vx_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS ida, b.vec_id AS idb,
        |       cosine_similarity(a.embedding, b.embedding) AS sim
        |FROM vx_emb a JOIN vx_emb b ON a.vec_id < b.vec_id
        |LIMIT 100""".stripMargin)
    val viaApi = viaSql.selectExpr("ida", "idb")
      .join(spark.table("vx_emb").selectExpr("vec_id AS ida", "embedding AS va"), "ida")
      .join(spark.table("vx_emb").selectExpr("vec_id AS idb", "embedding AS vb"), "idb")
      .select($"ida", $"idb", VectorExpressions.cosine($"va", $"vb").as("sim2"))
    val joinBack = viaSql.join(viaApi, Seq("ida", "idb"))
      .where($"sim" =!= $"sim2").count()
    assert(joinBack == 0)
  }

  test("zero-norm and empty arrays return 0.0, nulls propagate") {
    val df = Seq(
      (Some(Array(0f, 0f)), Some(Array(1f, 1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (None, Some(Array(1f, 1f)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.cosine($"a", $"b").as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 0.0 && out(2) == null)
  }

  test("native l2_squared is bit-equal to the HOF fold (same accumulation order)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ida" < $"idb").limit(2000)
    // executable spec: left-to-right fold from a 0.0 seed over
    // (va_i - vb_i)^2, each operand widened to double first
    val hof = aggregate(
      zip_with($"va".cast("array<double>"), $"vb".cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)
    val mismatches = pairs.select(
      VectorExpressions.l2Squared($"va", $"vb").as("native"), hof.as("spec"))
      .where($"native" =!= $"spec").count()
    assert(mismatches == 0, "fold order / widening contract broken")
  }

  test("l2_squared: empty arrays -> 0.0, nulls propagate, identical vectors -> 0.0") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(1f, 2f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (None, Some(Array(1f, 1f)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.l2Squared($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 0.0 && out(2) == null)
  }

  test("registered SQL function works and survives codegen + interpreted paths") {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT round(cosine_similarity(a.embedding, b.embedding), 6) AS sim
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .as[Double].head()
    val viaCol = spark.table("emb").where($"vec_id" === 0)
      .crossJoin(spark.table("emb").where($"vec_id" === 1).select($"embedding".as("e2")))
      .select(round(VectorExpressions.cosine($"embedding", $"e2"), 6))
      .as[Double].head()
    assert(viaSql == viaCol)
  }
}
