package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.pipeline.{CombineJob, FormatFlights, UsageProjection}

/** Streaming wrapper of the whole pipeline: raw-JSON file source →
  * format → (per micro-batch) combine + usage → parquet sink.
  *
  * The reference's "real time" is an Airflow cron re-running batch
  * jobs every minute (`dags/sky_safe_dag.py:31`); this is the
  * Spark-native equivalent — `Trigger.ProcessingTime` micro-batches
  * with `foreachBatch` running the exact same batch stages, so batch
  * and streaming share one code path and one set of semantics
  * (snapshot-overwrite per batch, keyed latest-state downstream).
  * No watermark is needed: each batch is a self-contained snapshot,
  * not an event-time window (SURVEY.md §2.10).
  */
object FlightStream {

  /** Start the pipeline stream.
    *
    * @param rawDir   directory watched for raw OpenSky JSON payloads
    * @param weather  static (slow-changing) formatted weather dimension
    * @param outDir   usage-layer output root; each batch overwrites
    *                 `outDir/batch=<id>` — downstream readers take the
    *                 max batch id (same latest-partition contract as the
    *                 reference lake layout)
    */
  def start(
      spark: SparkSession,
      rawDir: String,
      weather: DataFrame,
      outDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val raw = spark.readStream
      .schema(Schemas.rawFlightsSchema)
      .option("multiLine", true)
      .option("maxFilesPerTrigger", 96) // bound per-batch work at scale
      .json(rawDir)

    val formatted = FormatFlights.fromRaw(raw)

    formatted.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val enriched = CombineJob.enrich(batch, weather)
          val usage = UsageProjection.usage(enriched)
          usage.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          ()
        }
      }
      .start()
  }
}
