package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise association rules (Agrawal et al. 1993, the
  * market-basket classic) over presence baskets: for every item pair
  * (a < b), support, both conditional confidences, and lift — the
  * "users who error also purchase" diagnostic over event streams,
  * and the co-tag affinity miner over document metadata.
  *
  * Exactness: every statistic is a ratio of exact integer counts —
  * one IEEE division each, lift as (n_ab·N)/(n_a·n_b) with the
  * products formed in int64 before ONE division (counts ≤ 2⁵³
  * convert losslessly; at larger scales the counts themselves are
  * the audit and lift overflows long before doubles lose them).
  *
  * Scale shape: dedup to (basket, item) presence map-side; the pair
  * join is per-basket (bounded by the ITEM DOMAIN per basket, not
  * basket size — presence dedup caps it); item supports ride a
  * broadcast (item domain is bounded). One shuffle keyed by basket,
  * one by pair.
  */
object AssociationRules {

  def pairRules(df: DataFrame, basketCol: Column, itemCol: String)
      : DataFrame = {
    val baskets = df.select(basketCol.as("_b"), col(itemCol).as("_i"))
      .distinct()
    val n = baskets.select(countDistinct(col("_b")).as("_n"))
    val items = baskets.groupBy(col("_i")).agg(count(lit(1)).as("_ni"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a._b") === col("b._b") && col("a._i") < col("b._i"))
      .groupBy(col("a._i").as("item_a"), col("b._i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(items.select(col("_i").as("item_a"),
        col("_ni").as("n_a"))), Seq("item_a"))
      .join(broadcast(items.select(col("_i").as("item_b"),
        col("_ni").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"),
        col("_n").as("n_baskets"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("_n").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"), 6)
          .as("conf_b_to_a"),
        round((col("n_ab") * col("_n")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }
}
