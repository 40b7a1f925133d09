package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive sequence analytics over per-key event streams —
  * the first-order Markov view of user behavior (click→view→purchase
  * transition structure, session-flow dashboards, UX funnel
  * diagnostics — the sequential complement of q145's ordered funnel,
  * which deliberately avoids ordering by using per-step minima).
  *
  * Determinism: the per-key order is (time, id) — a TOTAL order, so
  * `lag` is well-defined even under timestamp ties; counts are then
  * order-independent integers, and each probability is one IEEE
  * division of those integers (identical on any engine).
  *
  * Scale shape: the lag window shuffles once by key and sorts only
  * within each key's partition-local run — no global sort. The pair
  * count is a map-side-combined aggregate over a tiny (|states|²)
  * result; the probability normalization windows over that tiny
  * aggregate, not over the raw events.
  */
object Sequences {

  /** (src_type, dst_type, n, p): count of consecutive-event
    * transitions per key and the per-source conditional probability
    * p = n / Σ_dst n.
    */
  def transitionCounts(
      events: DataFrame,
      key: String,
      stateCol: String,
      orderBy: Seq[Column]): DataFrame = {
    val seq = Window.partitionBy(key).orderBy(orderBy: _*)
    val pairs = events
      .withColumn("src_type", lag(col(stateCol), 1).over(seq))
      .filter(col("src_type").isNotNull)
      .groupBy(col("src_type"), col(stateCol).as("dst_type"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy("src_type")
    pairs.withColumn(
      "p", col("n").cast("double") / sum("n").over(bySrc).cast("double"))
  }
}
