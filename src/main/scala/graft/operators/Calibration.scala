package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier calibration audit — reliability bins, expected
  * calibration error and the Brier score for any scored+labeled
  * frame: the health check a pipeline runs on its quality/LID
  * classifier before trusting the scores as sampling weights (an
  * overconfident filter silently skews the corpus; ECE is the
  * number that catches it).
  *
  * Exactness: scores arrive on the 6-dp lattice and immediately
  * become micro-units (`s6 = round(score·10⁶)` — exact integers),
  * labels are 0/1, and every statistic reduces to INTEGER
  * aggregates: bin = `min(s6·B div 10⁶, B−1)`, per-bin confidence/
  * accuracy numerators are plain sums, the ECE numerator is
  * `Σ_b |n_pos·10⁶ − Σs6|` (the per-bin `(n_b/N)·|acc−conf|` terms
  * share the common denominator `N·10⁶`), and the Brier numerator
  * `Σ (s6 − y·10⁶)²` rides DECIMAL(38,0). Each reported double is
  * ONE division of exact integers — identical IEEE in any engine,
  * no rounding step at all.
  *
  * Scale shape: one map-side-combinable aggregate to ≤ B bin rows,
  * one ≤ B-row summary fold, one broadcast back — corpus scanned
  * once, nothing driver-side.
  */
object Calibration {

  /** Per-bin reliability rows with the scalar summary cross-joined:
    * (bin, n_bin, conf, acc, gap, ece, brier). `scoreCol` must lie
    * in [0, 1] on the 6-dp lattice; `labelCol` is 0/1-castable.
    */
  def reliability(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"unreasonable bin count: $bins")
    val rows = df.select(
      round(col(scoreCol) * 1000000, 0).cast("long").as("_s6"),
      col(labelCol).cast("long").as("_y"))
    val binned = rows
      .withColumn("_bin",
        least(expr(s"_s6 * $bins div 1000000"), lit(bins - 1L)))
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("n_bin"),
        sum(col("_s6")).as("_sum_s6"),
        sum(col("_y")).as("_n_pos"),
        sum(((col("_s6") - col("_y") * 1000000L) *
          (col("_s6") - col("_y") * 1000000L)).cast("decimal(38,0)"))
          .as("_brier_num"))
    val summary = binned.agg(
      sum(col("n_bin")).as("_nt"),
      sum(abs(col("_n_pos") * 1000000L - col("_sum_s6"))).as("_ece_num"),
      sum(col("_brier_num")).as("_brier_tot"))
    val conf = col("_sum_s6").cast("double") /
      (col("n_bin").cast("double") * lit(1000000.0))
    val acc = col("_n_pos").cast("double") / col("n_bin").cast("double")
    binned.crossJoin(broadcast(summary)).select(
      col("_bin").cast("int").as("bin"),
      col("n_bin"),
      conf.as("conf"),
      acc.as("acc"),
      abs(acc - conf).as("gap"),
      (col("_ece_num").cast("double") /
        (col("_nt").cast("double") * lit(1000000.0))).as("ece"),
      (col("_brier_tot").cast("double") /
        (col("_nt").cast("double") * lit(1.0e12))).as("brier"))
  }
}
