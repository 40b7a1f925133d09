package graft.pipeline

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.lake.{DocumentSink, LakePaths}

/** Sequenced batch runner reproducing the reference DAG topology
  * `extract ×2 → format ×2 → combine → index`
  * (`dags/sky_safe_dag.py:72-74`), over the lake layout.
  *
  * Sources are traits — the offline default replays fixture files; an
  * online deployment implements the same trait with an HTTP client
  * (reference S1–S3). Every layer write is an idempotent overwrite of
  * the run's own partition, so re-runs are safe (reference
  * `mode("overwrite")` + keyed upsert).
  */
trait RawSource {
  /** Land one raw snapshot into `targetDir`; returns files written. */
  def extract(spark: SparkSession, targetDir: String): Int
}

/** Replays a fixture file into the raw layer (offline extract). */
final class FileReplaySource(fixturePath: String) extends RawSource {
  override def extract(spark: SparkSession, targetDir: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(fixturePath)
    val dst = new org.apache.hadoop.fs.Path(targetDir, src.getName)
    val fs = dst.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src, fs, dst,
      false, conf)
    1
  }
}

final class PipelineRunner(
    paths: LakePaths,
    flightsSource: RawSource,
    weatherSource: RawSource,
    sink: DocumentSink) {

  /** One full pipeline run (≅ one Airflow DAG run per minute). */
  def runOnce(spark: SparkSession, at: LocalDateTime = LocalDateTime.now()): RunMetrics = {
    // extract — land raw snapshots
    val rawFlightsDir = paths.partitionPath("raw", "opensky", "flights", at)
    val rawWeatherDir = paths.partitionPath("raw", "open_meteo", "weather", at)
    flightsSource.extract(spark, rawFlightsDir)
    weatherSource.extract(spark, rawWeatherDir)

    // format — engine-side parse + typing
    val formattedFlights = FormatFlights.fromRawJson(spark, rawFlightsDir)
    val formattedWeather = FormatWeather.fromRawJson(spark, rawWeatherDir)
    val fFlightsDir = paths.partitionPath("formatted", "opensky", "flights", at)
    val fWeatherDir = paths.partitionPath("formatted", "open_meteo", "weather", at)
    formattedFlights.write.mode(SaveMode.Overwrite).parquet(fFlightsDir)
    formattedWeather.write.mode(SaveMode.Overwrite).parquet(fWeatherDir)

    // combine — read back the latest partitions (layer contract), enrich
    val flights = spark.read.parquet(
      paths.latestPartition(spark, "formatted", "opensky", "flights").get)
    val weather = spark.read.parquet(
      paths.latestPartition(spark, "formatted", "open_meteo", "weather").get)
    val enriched = CombineJob.enrich(flights, weather)
    val enrichedDir = paths.partitionPath("enriched", "sky_safe", "flights_weather", at)
    enriched.write.mode(SaveMode.Overwrite).parquet(enrichedDir)

    // usage + index
    val usage = UsageProjection.usage(spark.read.parquet(enrichedDir))
    val usageDir = paths.partitionPath("usage", "sky_safe", "dashboard", at)
    usage.write.mode(SaveMode.Overwrite).parquet(usageDir)
    val docs = UsageProjection.latestPerAircraft(
      UsageProjection.documents(spark.read.parquet(usageDir)))
    // typed serving contract enforced at the sink boundary — the
    // engine-side analog of the reference's pinned ES index mapping
    // (src/index_elastic.py:22-62): mis-typed documents fail here, not
    // in the serving store
    new graft.lake.ContractSink(sink, graft.lake.ServingContract.flightDocuments)
      .upsert(docs, "icao24")

    // one aggregation pass for the run metrics (the reference re-runs
    // the whole lineage per count — SURVEY.md §4 anti-pattern)
    val enrichedCached = spark.read.parquet(enrichedDir)
    val row = enrichedCached.selectExpr(
      "count(*) AS rows",
      "sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS anomalies").first()
    RunMetrics(row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }
}

final case class RunMetrics(enrichedRows: Long, anomalies: Long)
