package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MARKET-BASKET co-occurrence affinity (the Apriori-1 pairs pass with
  * lift scoring — Agrawal & Srikant's first level, which is where
  * production affinity systems stop): for every item pair sharing a
  * basket, support `n_ab` and `lift = (n_ab·N)/(n_a·n_b)` — lift > 1 =
  * bought together MORE than independence predicts. The co-purchase /
  * co-click / co-citation readout; in corpus work the same operator
  * scores tag/domain co-occurrence.
  *
  * Scale shape: one basket-keyed partial agg collects each basket's
  * DISTINCT item set (sorted); the pair generator is a map-side array
  * expansion over that set, so its volume is Σ w_b² over basket widths
  * — bounded by `maxBasketSize` (oversized baskets dropped WHOLE, the
  * LSH-bucket/ER-block/spatial-cell cap discipline: one 10⁶-item
  * basket must not go quadratic) — and the only corpus-sized exchanges
  * are the basket agg and the (pair, count) partial agg. The
  * `minSupport` band prunes the pair tail BEFORE the two item-count
  * joins (the q141 banding discipline); `N` rides a broadcast scalar.
  * Top-k plans as TakeOrderedAndProject.
  *
  * Exactness: supports are exact BIGINT; lift is one division of
  * integer products rounded 6 dp; ranking on (lift, ia, ib) is fully
  * deterministic.
  */
object Affinity {

  /** Top-k item pairs by lift. Returns (ia, ib, n_ab, n_a, n_b, lift)
    * with ia < ib, ranked (lift DESC, ia, ib), `n_ab >= minSupport`.
    *
    * Plan shape (optimization round 13): ONE basket-keyed partial agg
    * replaces the old distinct + oversized-basket anti-join + basket-
    * keyed self-join — items dedupe inside `collect_set`, oversized
    * baskets drop on the agg output, and the ia < ib pairs generate
    * MAP-SIDE from each basket's sorted item array (pair volume is
    * still Σ w_b², bounded by `maxBasketSize`, but it never crosses
    * the wire un-aggregated a second time). The basket count rides a
    * broadcast scalar instead of a driver collect, so the whole
    * operator is one lazy plan: 3 exchanges (baskets, pair counts,
    * item counts) where the self-join form had 6.
    */
  def coPurchaseLift(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, k: Int = 20,
      maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val baskets = Parallelism.ensureCompute(df)
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("its"))
      .where(size(col("its")) <= maxBasketSize)
    val nB = baskets.agg(count(lit(1)).as("n"))
    val itemCounts = baskets
      .select(explode(col("its")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = baskets
      // singleton baskets yield no pairs; sequence(2, 1) would DESCEND
      .where(size(col("its")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("its")) - 1),
        a => transform(
          sequence(a + 1, size(col("its"))),
          z => struct(element_at(col("its"), a).as("ia"),
            element_at(col("its"), z).as("ib")))))).as("p"))
      .groupBy(col("p.ia").as("ia"), col("p.ib").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("i").as("ia"), col("n_i").as("n_a")), Seq("ia"))
      .join(itemCounts.select(col("i").as("ib"), col("n_i").as("n_b")), Seq("ib"))
      .crossJoin(broadcast(nB))
      .withColumn("lift",
        round((col("n_ab") * col("n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6))
      .orderBy(col("lift").desc, col("ia").asc, col("ib").asc)
      .limit(k)
      .select(col("ia"), col("ib"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift"))
  }
}
