package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture application — the MERGE/upsert semantics a
  * lakehouse table maintenance job runs: fold a keyed change log
  * (upserts + deletes) into the final snapshot, last writer wins.
  */
object Cdc {

  /** Apply a change log to produce the current snapshot.
    *
    * Per key, the change with the highest `orderCols` tuple (compared
    * lexicographically — pass a tie-breaking id as the last element
    * for a total order) decides the row: if `isDelete` holds on it the
    * key is absent from the snapshot, otherwise its payload is the
    * row. Emits the key columns, the winning payload columns, and
    * `n_changes` (how many log entries the key folded).
    *
    * Scale shape: ONE map-side-combinable aggregate — `max_by` over
    * the order struct runs partial aggregation per partition, so the
    * shuffle carries one candidate row per (partition, key), not the
    * log. No window, no per-key sort. This is the batch form; the
    * streaming twin is a `mapGroupsWithState` keeping the same
    * (order, payload) maximum per key.
    */
  def applyChangeLog(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      payloadCols: Seq[String],
      isDelete: Column): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && payloadCols.nonEmpty,
      "keyCols, orderCols and payloadCols must be non-empty")
    val ord = struct(orderCols.map(col): _*)
    val carried = struct((payloadCols.map(col) :+
      isDelete.as("_is_delete")): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(carried, ord).as("_last"),
        count(lit(1)).as("n_changes"))
      .filter(!col("_last._is_delete"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"_last.$c").as(c)) :+
        col("n_changes"): _*)
  }
}
