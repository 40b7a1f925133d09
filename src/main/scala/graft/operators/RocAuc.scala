package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC via the Mann–Whitney U statistic — the ranking
  * companion to the q279 calibration audit: calibration says the
  * quality/LID classifier's probabilities mean what they claim; AUC
  * says the ORDERING separates the classes, which is what a
  * top-p%-gate (q134) actually consumes.
  *
  * Exactness: scores live on the 6-dp lattice, so the audit
  * aggregates once to ≤ 10⁶+1 DISTINCT-SCORE rows (c, pos, neg per
  * score) — corpus-size-independent, the q272 histogram trick. Over
  * those, ascending:
  *   2·U = Σ_s ( 2·pos_s·negBelow_s + pos_s·neg_s )
  * (ties at the same score contribute the ½ convention without ever
  * leaving integers), and AUC = 2U / (2·n_pos·n_neg) is ONE division
  * of exact DECIMAL(38,0) integers. All-one-class input yields null
  * (0/0), pinned in the oracle too.
  *
  * Scale shape: one map-side-combinable (score → counts) aggregate,
  * one window over the ≤ 10⁶+1-row score histogram (bounded, single
  * partition by construction — the documented exception, same as the
  * q272 boundary-bin walk), one scalar fold.
  */
object RocAuc {

  /** One-row AUC summary: (n, n_pos, n_neg, auc). `scoreCol` must
    * lie in [0, 1] on the 6-dp lattice; `labelCol` is 0/1-castable.
    * (2U stays internal on DECIMAL(38,0) — it overflows int64 at
    * trillion-row corpora.)
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.select(
      round(col(scoreCol) * 1000000, 0).cast("long").as("_s6"),
      col(labelCol).cast("long").as("_y"))
      .groupBy(col("_s6"))
      .agg(count(lit(1)).as("_c"), sum(col("_y")).as("_p"))
      .withColumn("_neg", col("_c") - col("_p"))
    val w = Window.orderBy(col("_s6"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("_nb", coalesce(sum(col("_neg")).over(w), lit(0L)))
      .agg(
        sum(col("_c")).as("n"),
        sum(col("_p")).as("n_pos"),
        sum(col("_neg")).as("n_neg"),
        sum((col("_p") * 2L * col("_nb") + col("_p") * col("_neg"))
          .cast("decimal(38,0)")).as("u2"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        (col("u2").cast("double") /
          (col("n_pos").cast("decimal(38,0)") *
            col("n_neg").cast("decimal(38,0)") * 2).cast("double"))
          .as("auc"))
  }
}
