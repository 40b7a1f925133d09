package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** FAA-rule composite risk scoring — the reference's flagship business
  * operator (B1/B2 in SURVEY.md §2.9).
  *
  * Exact semantics from `src/combine_spark.py:134-173` and its truth
  * table `tests/test_risk_score.py`:
  *   thunderstorm  weather_code >= 95            → +40
  *   wind gusts    > 80 → +25  else > 50 → +10
  *   precipitation > 5  → +20  else > 0  → +10
  *   visibility    < 1000 → +20 else < 3000 → +10
  *   cloud cover   > 80 → +10  else > 50 → +5
  *   low airborne  !on_ground && baro_altitude < 300 → +15
  * Max 130. Null inputs contribute 0 (each `when` chain falls through
  * to `otherwise(0)`).
  */
object RiskFunctions {

  def thunderstormTerm(weatherCode: Column): Column =
    when(weatherCode >= 95, 40).otherwise(0)

  def gustTerm(gusts: Column): Column =
    when(gusts > 80, 25).when(gusts > 50, 10).otherwise(0)

  def precipitationTerm(precip: Column): Column =
    when(precip > 5, 20).when(precip > 0, 10).otherwise(0)

  def visibilityTerm(visibility: Column): Column =
    when(visibility < 1000, 20).when(visibility < 3000, 10).otherwise(0)

  def cloudTerm(cloudCover: Column): Column =
    when(cloudCover > 80, 10).when(cloudCover > 50, 5).otherwise(0)

  def lowAltitudeTerm(onGround: Column, baroAltitude: Column): Column =
    when((onGround === false) && (baroAltitude < 300), 15).otherwise(0)

  /** Sum of the six additive terms, cast int (reference `:165`). */
  def riskScore(weatherCode: Column, gusts: Column, precip: Column,
                visibility: Column, cloudCover: Column,
                onGround: Column, baroAltitude: Column): Column =
    (thunderstormTerm(weatherCode) + gustTerm(gusts) +
      precipitationTerm(precip) + visibilityTerm(visibility) +
      cloudTerm(cloudCover) + lowAltitudeTerm(onGround, baroAltitude))
      .cast(IntegerType)

  /** Risk score over the enriched frame's `w_`-prefixed columns. */
  def riskScoreEnriched: Column =
    riskScore(col("w_weather_code"), col("w_wind_gusts_10m"),
      col("w_precipitation"), col("w_visibility"), col("w_cloud_cover"),
      col("on_ground"), col("baro_altitude"))

  /** LOW / MEDIUM / HIGH category (reference `src/combine_spark.py:168-173`). */
  def riskCategory(score: Column): Column =
    when(score >= 60, "HIGH").when(score >= 30, "MEDIUM").otherwise("LOW")

  /** Rule-based flight-phase fallback classifier
    * (B6, reference `src/combine_spark.py:301-318`).
    */
  def fallbackPhase(baroAltitude: Column, velocity: Column, verticalRate: Column): Column =
    when(baroAltitude < 300 && velocity < 60, "Takeoff / Landing")
      .when(baroAltitude > 3000 && abs(verticalRate) < 2.5, "Cruise")
      .otherwise("Climb / Descent")

  /** Fallback phase ids: T/L=0, C/D=1, Cruise=2 (reference `:313-318`). */
  def fallbackPhaseId(phase: Column): Column =
    when(phase === "Takeoff / Landing", 0)
      .when(phase === "Cruise", 2)
      .otherwise(1)
      .cast(IntegerType)

  /** Position-source label (reference `src/format_flights.py:155-162`). */
  def positionSourceLabel(positionSource: Column): Column =
    when(positionSource === 0, "ADS-B")
      .when(positionSource === 1, "ASTERIX")
      .when(positionSource === 2, "MLAT")
      .when(positionSource === 3, "FLARM")
      .otherwise(lit(null).cast("string"))
}
