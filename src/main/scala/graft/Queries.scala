package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** The oracle-checked query inventory (SURVEY.md §2.10).
  *
  * Every entry here is a pure function (SparkSession, sfDir) => DataFrame
  * with a matching DuckDB SQL in [[Oracles]]. Column names and value
  * formats are aligned with the oracle on purpose: the driver sorts
  * columns by name and hash-compares values.
  *
  * Determinism rules used throughout:
  *  - no wall-clock / random values in checked output (fixed literal stamps);
  *  - floating aggregates rounded only where summation order can differ
  *    (never on pass-through values);
  *  - ties broken by a unique key wherever an ordering matters.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // Fixed audit stamps so merge results are oracle-comparable.
  private val DestStamp = "2024-01-01 00:00:00"
  private val DeltaStamp = "2024-02-01 00:00:00"

  /** Deterministic upsert delta derived from `orders` (FIXTURES.md):
    * keys %10==3 -> updated (price+1000, status U)
    * keys %10==7 -> re-sent unchanged (merge must keep dest row + old stamp)
    * keys %10==5 -> new keys (+1e9, status N) -> inserts
    */
  def ordersDelta(orders: DataFrame): DataFrame = {
    val upd = orders
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .withColumn("o_orderstatus", lit("U"))
      .where(col("o_orderkey") % 10 === 3)
    val resend = orders.where(col("o_orderkey") % 10 === 7)
    val ins = orders
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("o_orderstatus", lit("N"))
      .where(col("o_orderkey") % 10 === 5)
    upd.unionByName(resend).unionByName(ins)
  }

  private def stampedOrders(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = t(spark, dir, "orders")
    val dest = Audit.stampAt(orders, lit(DestStamp))
    val delta = Audit.stampAt(ordersDelta(orders), lit(DeltaStamp))
    (dest, delta)
  }

  // ---------------------------------------------------------------- Q1
  /** A1: full-row distinct (`etl.py:50`). */
  def q1DedupFull(spark: SparkSession, dir: String): DataFrame =
    Dedup.fullRow(t(spark, dir, "lineitem"))

  // ---------------------------------------------------------------- Q2
  /** A2: deterministic latest-per-key — latest event per user
    * (order ts desc, event_id desc). Single partial-aggregatable shuffle.
    */
  def q2LatestByKey(spark: SparkSession, dir: String): DataFrame =
    Dedup.byKeyLatest(t(spark, dir, "events"),
      keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))

  // ---------------------------------------------------------------- Q3
  /** J1+P5: MERGE upsert of the derived delta into orders. */
  def q3Merge(spark: SparkSession, dir: String): DataFrame = {
    val (dest, delta) = stampedOrders(spark, dir)
    Merge.merge(dest, delta, pk = Seq("o_orderkey"))
  }

  // ---------------------------------------------------------------- Q4
  /** Schema drift: batch B adds `c_note` and re-types `c_nationkey` to
    * string -> sidecar `c_nationkey_string` (`etl.py:263-276`).
    */
  def q4DriftUnion(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "customer")
    val b = a
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))
      .withColumn("c_note", lit("b"))
    SchemaDrift.driftUnion(a, b)
  }

  // ---------------------------------------------------------------- Q5
  /** P1: audit stamping — every row stamped, stamp is query-constant. */
  def q5Audit(spark: SparkSession, dir: String): DataFrame = {
    val stamped = Audit.stamp(t(spark, dir, "customer"))
    stamped.agg(
      count(lit(1)).as("n_rows"),
      count(col(Audit.ColumnName)).as("n_stamped"),
      countDistinct(col(Audit.ColumnName)).as("n_stamps"))
  }

  // ---------------------------------------------------------------- Q7
  /** S6: catalog introspection of lineitem as a DataFrame. */
  def q7Catalog(spark: SparkSession, dir: String): DataFrame =
    Catalog.describe(spark, t(spark, dir, "lineitem"))

  // ---------------------------------------------------------------- Q8
  /** O1: fan-out — 4 disjoint key-partitions of orders each merged with
    * its slice of the delta; the union must equal the single global merge
    * (q3's oracle). Each branch is an independent broadcast-merge plan, so
    * a scheduler may run them concurrently; disjointness guarantees
    * concurrent == sequential.
    */
  def q8Fanout(spark: SparkSession, dir: String): DataFrame = {
    val (dest, delta) = stampedOrders(spark, dir)
    val parts = (0 until 4).map { i =>
      val d = dest.where(pmod(col("o_custkey"), lit(4)) === i)
      val s = delta.where(pmod(col("o_custkey"), lit(4)) === i)
      Merge.merge(d, s, pk = Seq("o_orderkey"))
    }
    parts.reduce(_.unionByName(_))
  }

  // ---------------------------------------------------------------- Q9
  /** §2.3 class: hash agg with partial aggregation + exact distinct-agg.
    * sum_qty exact (integer-valued doubles); order-sensitive double sums
    * rounded to stay oracle-stable.
    */
  def q9Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_partkey")).as("distinct_parts"))

  // ---------------------------------------------------------------- Q10
  /** §2.4 class: star join — fact `orders` joined to broadcast dims.
    * Dims (customer/nation/region) are broadcast: zero shuffle of the fact
    * until the final 1-shuffle aggregation.
    */
  def q10StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  // ---------------------------------------------------------------- Q11
  /** §2.5 class: window top-k — top 3 orders per customer by price.
    * Deterministic tiebreak on o_orderkey.
    */
  def q11WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
  }
}
