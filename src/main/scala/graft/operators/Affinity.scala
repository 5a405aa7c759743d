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
  * Scale shape: baskets dedupe to distinct (basket, item) first; the
  * pair generator is a basket-keyed SELF-join, so its volume is
  * Σ w_b² over basket widths — bounded by `maxBasketSize` (oversized
  * baskets dropped WHOLE, the LSH-bucket/ER-block/spatial-cell cap
  * discipline: one 10⁶-item basket must not go quadratic). The
  * `minSupport` band prunes the pair tail BEFORE the two item-count
  * joins (the q141 banding discipline); `N` and nothing else collapses
  * to a driver scalar. Top-k plans as TakeOrderedAndProject.
  *
  * Exactness: supports are exact BIGINT; lift is one division of
  * integer products rounded 6 dp; ranking on (lift, ia, ib) is fully
  * deterministic.
  */
object Affinity {

  /** Top-k item pairs by lift. Returns (ia, ib, n_ab, n_a, n_b, lift)
    * with ia < ib, ranked (lift DESC, ia, ib), `n_ab >= minSupport`.
    */
  def coPurchaseLift(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, k: Int = 20,
      maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = Parallelism.ensureCompute(df)
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val oversized = items.groupBy(col("b"))
      .agg(count(lit(1)).as("__w")).where(col("__w") > maxBasketSize)
      .select(col("b"))
    val kept = items.join(oversized, Seq("b"), "left_anti")
    val n = kept.select(col("b")).distinct().count()
    val itemCounts = kept.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = kept.as("x")
      .join(kept.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("ia"), col("y.i").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("i").as("ia"), col("n_i").as("n_a")), Seq("ia"))
      .join(itemCounts.select(col("i").as("ib"), col("n_i").as("n_b")), Seq("ib"))
      .withColumn("lift",
        round((col("n_ab") * lit(n)).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6))
      .orderBy(col("lift").desc, col("ia").asc, col("ib").asc)
      .limit(k)
      .select(col("ia"), col("ib"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift"))
  }
}
