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

  /** Top-k most frequent length-3 event paths — the "what do users
    * actually do" sequence-mining readout behind UX-flow and
    * funnel-discovery dashboards. Consecutive within a key under the
    * (time, id) total order (tie-safe, like [[transitionCounts]]);
    * counts are exact integers; the top-k is a bounded
    * TakeOrdered (ties broken by the path strings), never a global
    * sort of the path table.
    *
    * Scale shape: one shuffle by key for the two lags (both windows
    * share the partitioning/sort → one Window node), one map-side-
    * combined count over ≤|states|³ paths, then top-k.
    */
  def topPaths(
      events: DataFrame,
      key: String,
      stateCol: String,
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val seq = Window.partitionBy(key).orderBy(orderBy: _*)
    events
      .withColumn("_s1", lag(col(stateCol), 2).over(seq))
      .withColumn("_s2", lag(col(stateCol), 1).over(seq))
      .filter(col("_s1").isNotNull && col("_s2").isNotNull)
      .groupBy(col("_s1").as("step1"), col("_s2").as("step2"),
        col(stateCol).as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }
}
