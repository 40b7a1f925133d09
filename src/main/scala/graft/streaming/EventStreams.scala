package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming operators over an event stream
  * (ts: timestamp, user_id, event_type, value).
  *
  * The reference is a 1-minute Airflow micro-batch, not true streaming
  * (SURVEY.md §2.10); these are the idiomatic Spark streaming
  * equivalents, usable both on `readStream` sources and (identically)
  * on batch frames — every function here is a plain
  * `DataFrame => DataFrame` so batch tests and streams share code.
  *
  * Scale notes: all aggregations are keyed by (window, key) → state
  * store size is bounded by the watermark horizon; no global state.
  */
object EventStreams {

  /** Tumbling/sliding event-time window aggregate with watermark —
    * late rows beyond `lateness` are dropped, closed windows emit once
    * (append mode).
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "5 minutes",
      slide: Option[String] = None,
      lateness: String = "10 minutes"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), windowLen, s)
      case None => window(col("ts"), windowLen)
    }
    events
      .withWatermark("ts", lateness)
      .groupBy(win.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Event-time session windows per user (gap-based, native
    * `session_window` — state closes `gap` after the last event).
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("sess.start").as("session_start"),
        col("sess.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup by key within the watermark horizon — the
    * streaming analog of exact dedup (first occurrence wins).
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Keyed latest-state view — streaming analog of the reference's
    * `_id=icao24` upsert sink (A8): in complete/update mode each key
    * holds its newest row's values.
    *
    * @param ord ordering column(s); pass a struct including a unique
    *            column to pin ties (default: ts only, reference parity)
    */
  def latestStateByKey(events: DataFrame, key: String,
      ord: Column = col("ts")): DataFrame =
    events
      .groupBy(col(key))
      .agg(max_by(struct(events.columns.filterNot(_ == key).map(col).toSeq: _*),
        ord).as("_latest"))
      .select(col(key) +: events.columns.filterNot(_ == key)
        .map(c => col(s"_latest.$c").as(c)).toSeq: _*)
}
