package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval concurrency: how many [start, end] intervals are active
  * on each day — the "orders in flight / sessions open / rooms
  * occupied over time" operator. The naive form (join every interval
  * against every day it covers) explodes by mean interval length;
  * this is the boundary-delta form: each interval contributes +1 at
  * its start day and −1 the day AFTER its end (inclusive ends), the
  * deltas aggregate per day, and a running sum over the day axis
  * yields the active count. Pure integer arithmetic.
  *
  * Output is the COMPRESSED timeline: one row per day on which the
  * count changes (between them it is constant) — the run-length
  * encoding of the concurrency curve.
  *
  * Scale shape: the per-day delta aggregate is map-side combined and
  * shrinks the data to O(distinct boundary days) before the running
  * sum; that final cumsum runs in ONE partition by design — its
  * input is bounded by the calendar span (a few thousand rows for
  * decades of days), not by the interval count, so the one-partition
  * window is safe at any data scale. The interval table itself is
  * never sorted globally.
  */
object Intervals {

  /** @param intervals (startCol, endCol) date columns, ends inclusive.
    * @return (day, n_active): the count of covering intervals for
    *         each boundary day, in date order semantics.
    */
  def concurrencyTimeline(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = intervals.select(
        explode(array(
          struct(col(startCol).as("day"), lit(1L).as("delta")),
          struct(date_add(col(endCol), 1).as("day"), lit(-1L).as("delta"))
        )).as("_e"))
      .select(col("_e.day"), col("_e.delta"))
    val daily = deltas.groupBy("day").agg(sum("delta").as("_d"))
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("n_active", sum(col("_d")).over(byDay).cast("long"))
      .select(col("day"), col("n_active"))
  }
}
