package graft.lake

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{FileReplaySource, PipelineRunner}

class LakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("latest-partition resolver picks newest date then hour") {
    val root = Files.createTempDirectory("graft_lake").toString
    val paths = LakePaths(root)
    for (d <- Seq("2026-02-25", "2026-02-26"); h <- Seq("09", "15"))
      Files.createDirectories(java.nio.file.Paths.get(
        s"$root/formatted/opensky/flights/date=$d/hour=$h"))
    val latest = paths.latestPartition(spark, "formatted", "opensky", "flights")
    assert(latest.exists(_.endsWith("date=2026-02-26/hour=15")))
    assert(paths.latestPartition(spark, "formatted", "opensky", "nope").isEmpty)
  }

  test("full pipeline run: raw fixtures -> enriched -> usage -> doc sink") {
    val root = Files.createTempDirectory("graft_lake2").toString
    val fixtures = Files.createTempDirectory("graft_fx").toString

    val flightsJson =
      """{"time": 1772121600, "_extracted_at": "2026-02-26T16:00:05",
        | "states": [["3c6444", "DLH9CK  ", "Germany", 1772121599, 1772121600,
        | 2.3522, 48.8566, 11277.6, false, 231.5, 85.2, -0.33,
        | null, 11582.4, "1000", false, 0],
        | ["ab1234", "AFR01", "France", 1772121599, 1772121600,
        | 5.1, 45.7, 150.0, false, 50.0, 10.0, 0.0,
        | null, 160.0, "7000", false, 0],
        | ["cd5678", "BAW9", "UK", 1772121599, 1772121600,
        | 3.0, 50.5, 2500.0, false, 150.0, 20.0, 12.0,
        | null, 2600.0, "7001", false, 1],
        | ["badrow", "X", "??", 1, 2, null, null, 0.0, true, 0.0, 0.0,
        | 0.0, null, 0.0, "0000", false, 0]]}""".stripMargin.replaceAll("\n", " ")
    val weatherJson =
      """[{"latitude": 48.709632, "longitude": 2.208563, "elevation": 89.0,
        | "_extracted_at": "2026-02-26T16:00:03",
        | "current": {"time": "2026-02-26T16:00", "temperature_2m": 7.4,
        |  "relative_humidity_2m": 82, "wind_speed_10m": 18.3,
        |  "wind_direction_10m": 240, "wind_gusts_10m": 55.1,
        |  "precipitation": 0.6, "rain": 0.6, "cloud_cover": 90,
        |  "weather_code": 61, "visibility": 24140.0}},
        | {"latitude": 50.561237, "longitude": 3.086957, "elevation": 20.0,
        | "_extracted_at": "2026-02-26T16:00:03",
        | "current": {"time": "2026-02-26T16:00", "temperature_2m": 5.0,
        |  "relative_humidity_2m": 90, "wind_speed_10m": 30.0,
        |  "wind_direction_10m": 200, "wind_gusts_10m": 85.0,
        |  "precipitation": 6.5, "rain": 6.5, "cloud_cover": 100,
        |  "weather_code": 95, "visibility": 800.0}}]"""
        .stripMargin.replaceAll("\n", " ")
    Files.writeString(java.nio.file.Paths.get(fixtures, "flights.json"), flightsJson)
    Files.writeString(java.nio.file.Paths.get(fixtures, "weather.json"), weatherJson)

    val sinkDir = Files.createTempDirectory("graft_sink").toString
    val runner = new PipelineRunner(
      LakePaths(root),
      new FileReplaySource(s"$fixtures/flights.json"),
      new FileReplaySource(s"$fixtures/weather.json"),
      new JsonDirSink(sinkDir))
    val metrics = runner.runOnce(spark, LocalDateTime.of(2026, 2, 26, 16, 0))

    assert(metrics.enrichedRows == 3) // badrow (null coords) dropped

    // layer layout honored
    val usage = spark.read.parquet(
      LakePaths(root).latestPartition(spark, "usage", "sky_safe", "dashboard").get)
    assert(usage.count() == 3 && usage.columns.length == 28)

    // weather enrichment: Lille-area flight got the stormy station and
    // a HIGH risk (code 95=+40, gusts 85=+25, precip 6.5=+20, vis 800=+20,
    // cloud 100=+10 → 115)
    val lille = usage.filter(col("icao24") === "cd5678").first()
    assert(lille.getAs[Int]("risk_score") == 115)
    assert(lille.getAs[String]("risk_category") == "HIGH")
    // CDG-area cruiser: gusts 55.1 → +10, precip 0.6 → +10, cloud 90 → +10
    val cdg = usage.filter(col("icao24") === "3c6444").first()
    assert(cdg.getAs[Int]("risk_score") == 30)

    // doc sink wrote one json doc per aircraft with location struct
    val docs = spark.read.json(s"$sinkDir/gen=000000")
    assert(docs.count() == 3)
    assert(docs.schema.fieldNames.contains("location"))

    // idempotent re-run: same partition overwritten, second sink gen
    val again = runner.runOnce(spark, LocalDateTime.of(2026, 2, 26, 16, 0))
    assert(again.enrichedRows == 3)
    assert(spark.read.json(s"$sinkDir/gen=000001").count() == 3)
  }
}
