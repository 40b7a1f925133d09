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
}
