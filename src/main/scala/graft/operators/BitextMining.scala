package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
  * CCMatrix/LASER criterion): raw cosine is a bad mining score
  * because some vectors are "hubs" — close to everything — so a
  * candidate pair (x, y) is scored by its cosine RELATIVE to what
  * each side scores against its other neighbours:
  *
  *   margin(x,y) = cos(x,y) / (mean_k(x)/2 + mean_k(y)/2)
  *
  * where mean_k(v) is the mean cosine of v's k nearest neighbours on
  * the opposite side. margin > 1 ⇒ the pair stands out above both
  * sides' neighbourhoods — the mined-bitext acceptance test.
  *
  * This implementation mines a bounded query set (side A) against
  * the full opposite side (side B): mean_k(x) over x's top-k in B,
  * mean_k(y) over y's top-k within the query set — the "intersection
  * of the sets in play" variant, which keeps BOTH kNN passes bounded
  * by |A|·|B| broadcast scans (no B×B pass anywhere; scoring every
  * y ∈ B against all of B is the quadratic trap this scoping
  * avoids).
  *
  * Exactness: every cosine is 6-dp rounded, neighbourhood means
  * carry the rounded values through DECIMAL sums (order-free) with
  * ONE division by the literal k, and the margin is one fixed IEEE
  * chain — hash-checkable end to end.
  */
object BitextMining {

  /** Mined candidates: (query_id, cand_id, cosine_sim, margin, rank)
    * — each query's top-k candidates by cosine, re-ranked by margin.
    * Pinned convention: neighbourhood means always divide by the
    * literal k, even when a side has fewer than k members — the
    * score stays deterministic either way.
    */
  def marginMine(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 4): DataFrame = {
    require(k >= 2, s"neighbourhood size must be >= 2: $k")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("_cv"))

    // all |A|×|B| cosines, query side broadcast (A is bounded)
    val pairs = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(VectorFunctions.cosine(col("_cv"), col("_qv")), 6)
          .cast("decimal(12,6)").as("cos"))

    // side-A neighbourhood mean: top-k of each query over B
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val topA = pairs.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= k)
    val meanA = topA.groupBy(col("query_id"))
      .agg((sum(col("cos")).cast("double") / k).as("_mean_q"))

    // side-B neighbourhood mean: each CANDIDATE's top-k over the
    // query set (the bounded opposite side)
    val wc = Window.partitionBy(col("cand_id"))
      .orderBy(col("cos").desc, col("query_id"))
    val meanB = pairs.withColumn("_rn", row_number().over(wc))
      .filter(col("_rn") <= k)
      .groupBy(col("cand_id"))
      .agg((sum(col("cos")).cast("double") / k).as("_mean_c"))

    // fixed chain: cos / (mean_q/2 + mean_c/2), 6-dp
    val margin = round(col("cos").cast("double")
      / (col("_mean_q") / 2.0 + col("_mean_c") / 2.0), 6)
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("cand_id"))
    topA.join(meanA, Seq("query_id"))
      .join(meanB, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        col("cos").cast("double").as("cosine_sim"), margin.as("margin"))
      .withColumn("rank", row_number().over(wRank))
  }
}
