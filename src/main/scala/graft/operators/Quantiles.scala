package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles (percentile_disc semantics):
  * the p-th percentile of a group of n values is the value at sorted
  * position ⌈p·n/100⌉ — an ACTUAL group member, never an interpolated
  * float, so the result is engine-portable with zero arithmetic drift
  * (the reference's dashboard range facets are the analog surface;
  * its approximate twin here is q44's approx_percentile).
  *
  * Determinism with ties: row_number among equal values is arbitrary,
  * but the VALUE at the k-th sorted position is unique regardless of
  * which duplicate occupies it — no tie-break column needed.
  *
  * Exactness: position index k = (p·n + 99) div 100 is pure integer
  * arithmetic, spelled identically in the oracle; selection is
  * `min(case when rn = k)` — no float ops at all.
  *
  * Scale shape: one shuffle keyed by the group, one per-partition
  * sort (the canonical exact-quantile cost — approximate sketches are
  * the q44 path when that cost is unacceptable); the two windows
  * (row_number, count) share the same partitioning, so Catalyst plans
  * a single Window node family over a single Exchange.
  */
object Quantiles {

  /** One row per group: n plus a `p<NN>` column per requested
    * percentile (integer percents, 1–100).
    */
  def groupDiscrete(df: DataFrame, groupCol: String, valueCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be integer percentiles in [1, 100]")
    val byValue = Window.partitionBy(col("g")).orderBy(col("v"))
    val byGroup = Window.partitionBy(col("g"))
    val ranked = df
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(byGroup))
    val picks: Seq[Column] = percents.map { p =>
      min(when(col("rn") === expr(s"($p * n + 99) div 100"), col("v")))
        .as(s"p$p")
    }
    ranked.groupBy(col("g"))
      .agg(max(col("n")).as("n"), picks: _*)
  }
}
