package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** Exact retrieval-quality metrics — MRR and NDCG@k per query — over
  * an embedding corpus with ground-truth labels (relevant = same
  * label). The eval side of the similarity family: q31/q132 produce
  * rankings, this scores them, closing the train→index→evaluate loop
  * a retrieval pipeline needs.
  *
  * Determinism: ranks come from the family's pinned total order
  * (cosine desc, id asc — the q31 contract, same sequential
  * left-to-right dot-product summation). Rank discounts 1/log₂(r+1)
  * are NOT computed at runtime — libm ulp differences would leak
  * into the hash — but baked as 9-dp DECIMAL literals from a single
  * generator shared with the SQL oracle, so DCG/IDCG sums are exact
  * decimal arithmetic in any row order, with ONE IEEE division
  * (dcg/idcg) at the end. MRR is one IEEE division of integers.
  *
  * Scale shape: the query side is broadcast (eval sets are small by
  * nature); the corpus is scanned once; per-query state after the
  * rank filter is k rows, and the label-frequency join for IDCG is a
  * |labels|-row broadcast.
  *
  * Contract: queries are rows of the corpus (self is excluded from
  * the candidate ranking); a query whose label has no other member
  * scores mrr = ndcg = 0.
  */
object RetrievalEval {

  /** 9-dp decimal literal strings for 1/log₂(r+1), r = 1..k — the
    * shared generator: both the Column expressions here and the SQL
    * oracle must embed EXACTLY these strings.
    */
  def discountLiterals(k: Int): IndexedSeq[String] =
    (1 to k).map(r => f"${1.0 / (math.log(r + 1.0) / math.log(2.0))}%.9f")

  /** Cumulative 9-dp decimal literal strings: idcg for m relevant. */
  def idealLiterals(k: Int): IndexedSeq[String] = {
    val d = discountLiterals(k).map(BigDecimal(_))
    (1 to k).map(m => d.take(m).sum.toString)
  }

  /** (query_id, n_rel, mrr, ndcg) for each query vector. */
  def mrrNdcg(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("_qvec"),
      col(labelCol).as("_qlabel"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("_sim", cosine(col(vecCol), col("_qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc, col(idCol).asc)
    val ranked = scored.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
      .withColumn("_rel", (col(labelCol) === col("_qlabel")).cast("int"))

    val disc = discountLiterals(k)
    val discOf: Column = (1 to k).foldLeft(lit(null).cast("decimal(12,9)")) {
      (acc, r) => when(col("_r") === r,
        lit(new java.math.BigDecimal(disc(r - 1)))).otherwise(acc)
    }
    val perQuery = ranked.groupBy("query_id").agg(
      sum(col("_rel").cast("long")).as("n_rel"),
      min(when(col("_rel") === 1, col("_r"))).as("_first"),
      sum(when(col("_rel") === 1, discOf)
        .otherwise(lit(BigDecimal(0)).cast("decimal(12,9)"))).as("_dcg"))

    // relevant-in-corpus count per label (minus self) bounds the ideal
    val labelFreq = corpus.groupBy(col(labelCol).as("_qlabel"))
      .agg(count(lit(1)).as("_lc"))
    val ideal = idealLiterals(k)
    val idcgOf: Column = (1 to k).foldLeft(lit(null).cast("decimal(22,9)")) {
      (acc, m) => when(least(lit(k.toLong), col("_lc") - 1L) === m,
        lit(new java.math.BigDecimal(ideal(m - 1)))).otherwise(acc)
    }
    perQuery
      .join(broadcast(q.select("query_id", "_qlabel")), Seq("query_id"))
      .join(broadcast(labelFreq), Seq("_qlabel"))
      .withColumn("_idcg", idcgOf)
      .select(
        col("query_id"),
        col("n_rel"),
        when(col("_first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("_first").cast("double")).as("mrr"),
        when(col("_idcg").isNull, lit(0.0))
          .otherwise(col("_dcg").cast("double") / col("_idcg").cast("double"))
          .as("ndcg"))
  }
}
