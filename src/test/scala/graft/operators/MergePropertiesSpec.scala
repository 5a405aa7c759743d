package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** ScalaCheck properties declared in SURVEY §5: merge idempotence, dedup
  * fixpoint, drift-union column-set commutativity — over generated tables.
  * (No scalatestplus bridge in the offline cache, so generators are sampled
  * deterministically with fixed seeds.)
  */
class MergePropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val rowGen: Gen[(Long, String, Double)] = for {
    id <- Gen.chooseNum(0L, 30L)
    name <- Gen.oneOf("a", "b", "c", null)
    v <- Gen.oneOf(1.0, 2.0, 3.0)
  } yield (id, name, v)

  private val tableGen: Gen[List[(Long, String, Double)]] = Gen.listOfN(20, rowGen)

  private def sample(seed: Long): List[(Long, String, Double)] =
    tableGen.pureApply(Gen.Parameters.default, Seed(seed))

  private val Trials = 8

  private def df(rows: List[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "name", "v")

  private def dedupKeys(rows: List[(Long, String, Double)]) =
    rows.groupBy(_._1).map(_._2.head).toList // one row per pk

  private def asSet(d: DataFrame) = d.collect().map(_.toSeq).toSet

  test("property: merge is idempotent for pk-unique sources") {
    for (i <- 0 until Trials) {
      val dest = df(dedupKeys(sample(i)))
      val src = df(dedupKeys(sample(i + 100)))
      val once = Merge.merge(dest, src, Seq("id"))
      val twice = Merge.merge(once, src, Seq("id"))
      assert(asSet(once) == asSet(twice), s"trial $i")
    }
  }

  test("property: merged table keys = union of key sets, pk stays unique") {
    for (i <- 0 until Trials) {
      val destRows = dedupKeys(sample(i))
      val srcRows = dedupKeys(sample(i + 200))
      val out = Merge.merge(df(destRows), df(srcRows), Seq("id"))
      val keys = out.select($"id").as[Long].collect().toSet
      assert(keys == (destRows.map(_._1) ++ srcRows.map(_._1)).toSet, s"trial $i")
      assert(out.count() == keys.size, s"trial $i: merge must keep pk uniqueness")
    }
  }

  test("property: source rows always win where keys collide") {
    for (i <- 0 until Trials) {
      val dest = df(dedupKeys(sample(i)))
      val srcRows = dedupKeys(sample(i + 300))
      val out = Merge.merge(dest, df(srcRows), Seq("id"))
      val got = out.collect()
        .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(2))).toMap
      srcRows.foreach { case (id, n, v) =>
        assert(got(id) == ((Option(n), v)), s"trial $i: source image must prevail for key $id")
      }
    }
  }

  test("property: fullRow dedup is a fixpoint") {
    for (i <- 0 until Trials) {
      val rows = sample(i)
      val once = Dedup.fullRow(df(rows))
      assert(asSet(once) == asSet(Dedup.fullRow(once)), s"trial $i")
      assert(once.count() == rows.distinct.size, s"trial $i")
    }
  }

  test("property: driftUnion column set is order-insensitive") {
    val colSets = Seq(Seq(), Seq("a"), Seq("a", "b"), Seq("b", "c", "d"))
    colSets.foreach { extraCols =>
      val base = Seq((1L, "x")).toDF("id", "v")
      val widened = extraCols.foldLeft(Seq((2L, "y")).toDF("id", "v")) {
        (d, c) => d.withColumn(c, org.apache.spark.sql.functions.lit(1))
      }
      val ab = SchemaDrift.driftUnion(base, widened)
      val ba = SchemaDrift.driftUnion(widened, base)
      assert(ab.columns.toSet == ba.columns.toSet, s"cols $extraCols")
      assert(ab.count() == 2 && ba.count() == 2, s"cols $extraCols")
    }
  }
}
