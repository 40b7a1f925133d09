package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Discrete survival curve over user lifetimes (observed-lifetime
    * life table): lifetime = last active day − first active day;
    * deaths(t) = users whose lifetime is exactly t, at_risk(t) =
    * users with lifetime ≥ t, hazard = deaths/at_risk, and the
    * Kaplan-Meier survivor function carried as
    * ln S(t) = Σ_{s ≤ t} ln(1 − hazard(s)) — each ln on the 1e-8
    * lattice ONCE per lifetime value, the cumulative an exact int64
    * sum, so the curve hash-checks without ever exponentiating
    * (exp() would reopen the cross-engine gap the lattice closes).
    * The terminal row (hazard = 1, survival 0) reports a NULL
    * ln-survival rather than −∞.
    *
    * Scale shape: one per-user min/max aggregate collapses the
    * stream to |users| rows, then a lifetime-keyed count collapses
    * those to |distinct lifetimes| rows — every window after that
    * runs over the bounded lifetime frame.
    */
  def survivalCurve(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val perUser = events
      .select(col(keyCol).as("u"),
        (unix_micros(col(tsCol)) / lit(86400000000L)).cast("long").as("d"))
      .groupBy(col("u"))
      .agg((max(col("d")) - min(col("d"))).as("_lt"))
    val deaths = perUser.groupBy(col("_lt").as("t_days"))
      .agg(count(lit(1)).as("deaths"))
    val ord = Window.partitionBy(lit(1)).orderBy(col("t_days"))
    val atRisk = sum(col("deaths")).over(
      ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    deaths
      .withColumn("at_risk", atRisk)
      .withColumn("_lat",
        when(col("deaths") < col("at_risk"),
          round(log(lit(1.0) - col("deaths").cast("double")
            / col("at_risk").cast("double")) * 1e8).cast("long")))
      .withColumn("_cum", sum(col("_lat")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_terminal", max(when(col("_lat").isNull, col("t_days")))
        .over(Window.partitionBy(lit(1))))
      .select(col("t_days"), col("at_risk"), col("deaths"),
        round(col("deaths").cast("double") / col("at_risk").cast("double"), 6)
          .as("hazard"),
        when(col("t_days") >= col("_terminal"), lit(null).cast("double"))
          .otherwise(round(col("_cum").cast("double") / 1e8, 6))
          .as("ln_survival"))
  }
}
