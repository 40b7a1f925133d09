package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — Fleiss' kappa over a (item, rater,
  * category) rating frame: the health check a labeling pipeline runs
  * on its human (or LLM-judge) annotations before trusting them as
  * training labels. Raw percent agreement rewards raters who dump
  * everything in the majority class; kappa subtracts the agreement
  * expected by chance from the marginal category mix, which is the
  * number an annotation vendor is actually held to.
  *
  * Contract: exactly one rating per (item, rater) and a CONSTANT
  * rater count r per item (the classical Fleiss setting; r is
  * derived from the data as total/N).
  *
  * Exactness: with n_ij = raters assigning item i to category j,
  *  - A  = Σ_ij n_ij(n_ij−1)            (observed-pairs numerator)
  *  - D1 = N·r·(r−1)                    (observed-pairs denominator)
  *  - C_j = Σ_i n_ij, T = N·r, B = Σ_j C_j², D2 = T²
  * then P̄ = A/D1, P̄_e = B/D2 and
  *   kappa = (A·D2 − B·D1) / (D1·(D2 − B)),
  * every operand an exact integer (products on DECIMAL(38,0)), so
  * each reported double is ONE division of exact integers —
  * identical IEEE in any engine, no rounding step (the q279 recipe).
  * Complete chance-impossible agreement (B = D2, P̄_e = 1) yields
  * null, matching SQL 0/0.
  *
  * Scale shape: one (item, category) count aggregate (map-side
  * combinable), one item fold, one ≤ k-row category fold, one
  * broadcast back — the rating frame is scanned once, nothing
  * driver-side.
  */
object Agreement {

  /** Per-category agreement rows with the scalar summary cross-
    * joined: (category, c_cat, p_cat, n_items, n_raters, p_bar,
    * p_e, kappa), ordered by category.
    */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
      catCol: String): DataFrame = {
    val cell = df.groupBy(col(itemCol).as("_it"), col(catCol).as("_cat"))
      .agg(count(lit(1)).as("_n"))
    // item fold: A-contributions and the item count ride one aggregate
    val items = cell.groupBy(col("_it"))
      .agg(sum(col("_n") * (col("_n") - 1L)).as("_pairs"),
        sum(col("_n")).as("_r"))
    val scalars = items.agg(
      sum(col("_pairs")).as("_a"),
      count(lit(1)).as("_nitems"),
      sum(col("_r")).as("_t"))
    val cats = cell.groupBy(col("_cat"))
      .agg(sum(col("_n")).as("c_cat"))
    val catTot = cats.agg(
      sum((col("c_cat") * col("c_cat")).cast("decimal(38,0)")).as("_b"))
    val joined = cats
      .crossJoin(broadcast(scalars))
      .crossJoin(broadcast(catTot))
      .withColumn("_rr", (col("_t") / col("_nitems")).cast("long"))
      .withColumn("_d1",
        (col("_nitems") * col("_rr") * (col("_rr") - 1L))
          .cast("decimal(38,0)"))
      .withColumn("_d2", (col("_t") * col("_t")).cast("decimal(38,0)"))
    val kNum = (col("_a").cast("decimal(38,0)") * col("_d2") -
      col("_b") * col("_d1")).cast("double")
    val kDen = (col("_d1") * (col("_d2") - col("_b"))).cast("double")
    joined.select(
      col("_cat").as("category"),
      col("c_cat"),
      (col("c_cat").cast("double") / col("_t").cast("double")).as("p_cat"),
      col("_nitems").as("n_items"),
      col("_rr").as("n_raters"),
      (col("_a").cast("double") / col("_d1").cast("double")).as("p_bar"),
      (col("_b").cast("double") / col("_d2").cast("double")).as("p_e"),
      (kNum / kDen).as("kappa"))
      .orderBy(col("category"))
  }
}
