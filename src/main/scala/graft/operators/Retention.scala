package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention matrix: users grouped by the week of their FIRST
  * event (the cohort), counted once per later week they return —
  * the (cohort_week, week_offset) → distinct-user grid every product
  * and every training-data freshness dashboard draws (reference
  * analog: the dashboard date-histogram family).
  *
  * Exactness: pure date arithmetic and integer counts — week
  * truncation (ISO Monday on both engines), a day difference divided
  * by 7 (exact: both dates are week starts, so the difference is a
  * multiple of 7), COUNT(DISTINCT user). No floats anywhere.
  *
  * Scale shape: first-event frame is one map-side-combinable min per
  * user; activity dedups to (user, week) BEFORE the join (shrinks the
  * fact side by the per-week event multiplicity); the join is keyed
  * by user and the final count shuffles by (cohort, offset) with a
  * partial distinct underneath. No windows, no driver.
  */
object Retention {

  def cohortWeeks(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weeks = events.select(col(keyCol).as("u"),
      date_trunc("week", col(tsCol)).cast("date").as("w"))
    val cohort = weeks.groupBy(col("u")).agg(min(col("w")).as("w0"))
    val active = weeks.distinct()
    active.join(cohort, Seq("u"))
      .select(col("w0"),
        expr("CAST(datediff(w, w0) DIV 7 AS BIGINT)").as("week_offset"),
        col("u"))
      .groupBy(col("w0"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
      .select(date_format(col("w0"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Rolling distinct active users — WAU/MAU as an EXACT timeline,
    * without the classic blow-ups. The naive forms are a
    * days×activity join (quadratic) or a windowed COUNT(DISTINCT)
    * (unsupported / state-explosive). Instead: a user active on day
    * a contributes to the rolling count on [a, a+W−1]; per user,
    * merge consecutive active days ≤ W−1 apart into coverage runs
    * [first, last+W−1] (runs of one user can never overlap, so no
    * double count), then [[Intervals.concurrencyTimeline]] turns the
    * run set into the exact count at every day it changes.
    *
    * Scale shape: dedup to (user, day) map-side; one shuffle by user
    * with a per-user day sort for the run merge (lag + cumsum flag);
    * then the interval timeline's boundary-delta aggregate. All date
    * and count arithmetic is integer-exact.
    */
  def rollingActiveUsers(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("day"))
    val act = events
      .select(col(keyCol).as("u"), col(tsCol).cast("date").as("day"))
      .distinct()
    val runs = act
      .withColumn("_prev", lag(col("day"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("day") > date_add(col("_prev"), windowDays - 1), 1L)
          .otherwise(0L))
      .withColumn("_run", sum(col("_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col("u"), col("_run"))
      .agg(min(col("day")).as("sd"),
        date_add(max(col("day")), windowDays - 1).as("ed"))
    Intervals.concurrencyTimeline(runs, "sd", "ed")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"))
  }
}
