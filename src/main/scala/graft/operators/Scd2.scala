package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: collapses a
  * per-key change log into validity intervals — consecutive rows with
  * the same state merge into one interval [valid_from, valid_to), the
  * key's current state gets a null valid_to. The standard dimension-
  * history operator of a warehouse load.
  *
  * Scale shape: two windows, both partitioned by the key (no global
  * ordering anywhere): one lag to find state-change rows, one lead
  * over the filtered change rows to close intervals. Events shuffle
  * once on the key; both windows reuse that partitioning (Catalyst
  * plans a single Exchange). Determinism: the order within a key is
  * (ts, seqCol) with seqCol unique per key, so interval boundaries are
  * total-order pinned.
  */
object Scd2 {

  /** (key, state, valid_from_us, valid_to_us) — interval bounds as
    * epoch microseconds (cross-engine exact; see oracle parity notes).
    */
  def buildHistory(
      changeLog: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, seqCol: String): DataFrame = {
    val changes = changeLog
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("ts_us"),
        col(stateCol).cast("string").as("state"), col(seqCol).as("_seq"))
      .withColumn("_prev", lag(col("state"), 1)
        .over(Window.partitionBy(col("key")).orderBy(col("ts_us"), col("_seq"))))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
    val wc = Window.partitionBy(col("key")).orderBy(col("ts_us"), col("_seq"))
    changes
      .select(col("key"), col("state"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(wc).as("valid_to_us"))
  }
}
