package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Risk-score truth table from the reference's `tests/test_risk_score.py`
  * (FIXTURES.md §4) — but unlike the reference, run against the
  * PRODUCTION expression, not a re-declared copy.
  */
case class W(w_weather_code: Double = 0, w_wind_gusts_10m: Double = 0.0,
    w_precipitation: Double = 0.0, w_visibility: Double = 10000.0,
    w_cloud_cover: Double = 0, on_ground: Boolean = false,
    baro_altitude: Double = 10000.0)

class RiskFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(w: W): Int =
    Seq(w).toDS.toDF()
      .select(RiskFunctions.riskScoreEnriched.as("s"))
      .first().getInt(0)

  test("benign defaults score 0") { assert(score(W()) == 0) }
  test("thunderstorm code 95 -> 40") { assert(score(W(w_weather_code = 95)) == 40) }
  test("gusts 85 -> 25") { assert(score(W(w_wind_gusts_10m = 85)) == 25) }
  test("gusts 60 -> 10") { assert(score(W(w_wind_gusts_10m = 60)) == 10) }
  test("precip 6 -> 20") { assert(score(W(w_precipitation = 6)) == 20) }
  test("precip 1 -> 10") { assert(score(W(w_precipitation = 1)) == 10) }
  test("visibility 500 -> 20") { assert(score(W(w_visibility = 500)) == 20) }
  test("visibility 2000 -> 10") { assert(score(W(w_visibility = 2000)) == 10) }
  test("cloud 90 -> 10") { assert(score(W(w_cloud_cover = 90)) == 10) }
  test("cloud 60 -> 5") { assert(score(W(w_cloud_cover = 60)) == 5) }
  test("airborne at 200m -> 15") { assert(score(W(baro_altitude = 200)) == 15) }
  test("on ground at 100m -> 0") {
    assert(score(W(baro_altitude = 100, on_ground = true)) == 0)
  }
  test("worst case sums to 130") {
    assert(score(W(99, 90, 10, 100, 100, false, 150)) == 130)
  }

  test("null weather terms contribute 0") {
    val df = spark.sql(
      """SELECT CAST(NULL AS DOUBLE) AS w_weather_code,
        |  CAST(NULL AS DOUBLE) AS w_wind_gusts_10m,
        |  CAST(NULL AS DOUBLE) AS w_precipitation,
        |  CAST(NULL AS DOUBLE) AS w_visibility,
        |  CAST(NULL AS DOUBLE) AS w_cloud_cover,
        |  false AS on_ground, 10000.0 AS baro_altitude""".stripMargin)
    assert(df.select(RiskFunctions.riskScoreEnriched).first().getInt(0) == 0)
  }

  test("category boundaries 29/30/59/60") {
    val cats = Seq(0, 29, 30, 59, 60, 130).toDF("s")
      .select(RiskFunctions.riskCategory($"s")).as[String].collect()
    assert(cats.sameElements(Array("LOW", "LOW", "MEDIUM", "MEDIUM", "HIGH", "HIGH")))
  }

  test("fallback phase rules and ids") {
    val rows = Seq(
      (150.0, 50.0, 0.0, "Takeoff / Landing", 0),
      (11000.0, 230.0, 0.5, "Cruise", 2),
      (2500.0, 150.0, 12.0, "Climb / Descent", 1))
    val df = rows.toDF("baro_altitude", "velocity", "vertical_rate", "exp", "expId")
      .withColumn("phase",
        RiskFunctions.fallbackPhase($"baro_altitude", $"velocity", $"vertical_rate"))
      .withColumn("id", RiskFunctions.fallbackPhaseId($"phase"))
    assert(df.filter($"phase" === $"exp" && $"id" === $"expId").count() == 3)
  }

  test("position source labels") {
    val got = Seq(0, 1, 2, 3, 9).toDF("p")
      .select(RiskFunctions.positionSourceLabel($"p")).collect().map(_.get(0))
    assert(got.sameElements(Array("ADS-B", "ASTERIX", "MLAT", "FLARM", null)))
  }
}
