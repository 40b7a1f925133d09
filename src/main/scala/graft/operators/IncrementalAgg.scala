package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a grouped aggregate kept as a
  * MERGEABLE partial state (count / decimal sum / min / max per key),
  * so a delta batch folds in WITHOUT rescanning the base table —
  * materialized-view maintenance, the batch analog of a streaming
  * stateful aggregation and the core trick behind every lakehouse
  * "incremental model".
  *
  * Algebra: all four partials form commutative monoids, so
  * `merge(partials(a), partials(b)) ≡ partials(a ∪ b)` exactly — the
  * sum is decimal-carried (order-independent), count/min/max are
  * trivially so. `finalize` derives the non-mergeable outputs (avg)
  * at read time, the same split Spark's own partial/final aggregation
  * uses internally.
  *
  * Scale shape: `partials` is one map-side-combine shuffle of the
  * delta only; `merge` shuffles state ∪ delta partials — O(keys), not
  * O(rows). At 100 TB the base is never re-read: a daily delta merge
  * touches the delta and the (much smaller) state table.
  */
object IncrementalAgg {

  /** Mergeable partial state of SUM/COUNT/MIN/MAX(valueCol) per key. */
  def partials(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sum"),
        min(col(valueCol)).as("_min"),
        max(col(valueCol)).as("_max"))

  /** Folds any number of partial states into one — associative and
    * commutative, so states can merge in any order or tree shape.
    */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    val keyCols = states.head.columns.filterNot(_.startsWith("_"))
    states.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_n")).cast("long").as("_n"),
        sum(col("_sum")).as("_sum"),
        min(col("_min")).as("_min"),
        max(col("_max")).as("_max"))
  }

  /** Read-time outputs: exact n/sum/min/max plus derived avg. */
  def finalize(state: DataFrame): DataFrame = {
    val keyCols = state.columns.filterNot(_.startsWith("_"))
    state.select(keyCols.map(col) ++ Seq(
      col("_n").as("n"),
      col("_sum").cast("double").as("sum"),
      col("_min").as("min"),
      col("_max").as("max"),
      (col("_sum").cast("double") / col("_n")).as("avg")): _*)
  }
}
