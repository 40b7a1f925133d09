package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Spatial nearest-neighbor join: attach, to every left row, the single
  * closest right row by a distance expression (J1+J2+W1 in SURVEY.md
  * §2.3/§2.5; reference `src/combine_spark.py:104-124`).
  *
  * Strategy notes for scale:
  *  - The right side (weather stations) is tiny → `broadcast` +
  *    `BroadcastNestedLoopJoin`: no shuffle of the big side at all.
  *  - Winner selection uses map-side `min_by(struct(...), dist)` via
  *    `groupBy` when the left key is unique per row, which partial-
  *    aggregates before the exchange — strictly cheaper than the
  *    reference's window (`row_number` forces a full shuffle + sort of
  *    N×M rows). A window variant is kept for parity testing.
  *  - Ties: the reference's `row_number` over `orderBy(dist)` breaks
  *    ties nondeterministically; we pin a secondary ordering on the
  *    right-side key columns (SURVEY.md §7.4).
  */
object NearestJoin {

  /** Prefix every column of `df` (reference `src/combine_spark.py:94-101`
    * does N withColumnRenamed calls; one `select` projection is a single
    * plan node).
    */
  def prefixColumns(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)).toSeq: _*)

  /** Window implementation — mirrors the reference's plan shape:
    * cross join → dist column → row_number per left key → rank==1.
    *
    * @param tieBreak columns on the joined frame that make the ordering
    *                 total (appended after dist ascending).
    */
  def nearestByWindow(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      dist: Column,
      tieBreak: Seq[Column]): DataFrame = {
    val joined = left.crossJoin(broadcast(right))
      .withColumn("dist_km", dist)
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col("dist_km").asc +: tieBreak: _*)
    joined
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") === 1)
      .drop("_rank")
  }

  /** Aggregation implementation — same result, cheaper plan: the
    * min_by partial-aggregates map-side, so the exchange carries one
    * row per left key instead of one per (left × right) pair.
    * Requires a total order on (dist, tieBreak) — callers pass a
    * struct-ordered tie-break expression.
    */
  def nearestByMinBy(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      dist: Column,
      tieBreak: Column): DataFrame = {
    val joined = left.crossJoin(broadcast(right))
      .withColumn("dist_km", dist)
    val others = joined.columns.filterNot(c => leftKeys.contains(c))
    // min_by on a struct gives lexicographic (dist, tieBreak) ordering —
    // deterministic winner per key.
    val ordKey = struct(col("dist_km"), tieBreak)
    joined
      .groupBy(leftKeys.map(col).toSeq: _*)
      .agg(min_by(struct(others.map(col).toSeq: _*), ordKey).as("_best"))
      .select((leftKeys.map(col) ++ others.map(c => col(s"_best.$c").as(c))).toSeq: _*)
  }

  /** The reference's concrete use: flights × weather stations by
    * Haversine km, weather columns prefixed `w_`.
    */
  def flightsToNearestWeather(flights: DataFrame, weather: DataFrame): DataFrame = {
    val w = prefixColumns(weather, "w_")
    nearestByWindow(
      flights, w, "icao24",
      GeoFunctions.haversineKm(
        col("latitude"), col("longitude"),
        col("w_latitude"), col("w_longitude")),
      tieBreak = Seq(col("w_latitude"), col("w_longitude")))
  }
}
