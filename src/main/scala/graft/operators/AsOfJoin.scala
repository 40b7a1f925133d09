package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of joins: attach to every left row the single nearest right row
  * with the same key — the most recent at-or-before (`backward`) or
  * the earliest at-or-after (`forward`) by timestamp. The classic
  * time-series enrichment operator (trades→quotes, events→state) that
  * Spark has no native relational operator for.
  *
  * Implementation is a tagged union + one window pass, not a range
  * join: both sides are unioned on an aligned schema, shuffled ONCE by
  * the key, sorted by (ts, side, tie-break), and the right payload is
  * propagated with `last`/`first(ignoreNulls = true)` over a one-sided
  * row frame. Left rows then read the nearest payload directly.
  *
  * Scale notes (100 TB): cost is a single hash-partition shuffle of
  * |L| + |R| rows plus a per-partition sort — the same shape as a
  * sort-merge join, with no N×M candidate blow-up for wide time
  * tolerances and no per-key driver loops. Skewed keys can be salted
  * upstream with [[SkewTools]]; AQE handles moderate skew.
  *
  * Determinism: ties on `rightTs` are pinned by `tieBreakCol` (kept in
  * its native type — casting it would null out string ids). Backward
  * picks the LAST entry under the frame (max tie-break at the winning
  * timestamp); forward picks the FIRST (min tie-break).
  */
object AsOfJoin {

  /** Most recent right row with `rightTs <= leftTs` (`strict` ⇒ `<`).
    *
    * @param rightPayload right-side columns to carry (must not collide
    *                     with left column names)
    * @param matchedTsCol output name for the matched right timestamp
    *                     (null when no match)
    * @param tolerance    optional max `leftTs - rightTs` in seconds
    *                     (microsecond-exact); staler matches are
    *                     nulled out
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreakCol: String,
      matchedTsCol: String = "matched_ts",
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, rightPayload, tieBreakCol,
      matchedTsCol, strict, tolerance, backwardDirection = true)

  /** Earliest right row with `rightTs >= leftTs` (`strict` ⇒ `>`).
    * Mirror image of [[backward]] — same single shuffle.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreakCol: String,
      matchedTsCol: String = "matched_ts",
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, rightPayload, tieBreakCol,
      matchedTsCol, strict, tolerance, backwardDirection = false)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreakCol: String,
      matchedTsCol: String,
      strict: Boolean,
      tolerance: Option[Long],
      backwardDirection: Boolean): DataFrame = {

    val payloadStruct = struct(
      (rightPayload.map(col) :+ col(rightTs).as(matchedTsCol)): _*)
    val payloadType = right.select(payloadStruct.as("_p")).schema("_p").dataType
    val lrowStruct = struct(left.columns.toSeq.map(col): _*)
    val lrowType = left.select(lrowStruct.as("_l")).schema("_l").dataType
    val tieType = right.schema(tieBreakCol).dataType

    // Equal-ts right rows must sort on the frame side of the left row
    // for inclusive semantics (so the frame sees them) and on the
    // opposite side for strict (so it cannot). Backward frames look at
    // preceding rows; forward frames at following rows.
    val rightSide =
      if (backwardDirection) { if (strict) 2 else 0 }
      else { if (strict) 0 else 2 }

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        lit(rightSide).as("_side"),
        col(tieBreakCol).as("_tb"),
        payloadStruct.as("_p"),
        lit(null).cast(lrowType).as("_l")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(tieType).as("_tb"),
        lit(null).cast(payloadType).as("_p"),
        lrowStruct.as("_l")): _*)

    val byKey = Window.partitionBy(keys.map(col): _*)
    val w: WindowSpec =
      if (backwardDirection)
        byKey.orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        byKey.orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc_nulls_first)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val picker =
      if (backwardDirection) last(col("_p"), ignoreNulls = true)
      else first(col("_p"), ignoreNulls = true)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("_m", picker.over(w))
      .filter(col("_side") === 1)

    val withinTol: Column = tolerance match {
      case Some(secs) =>
        val gapMicros =
          if (backwardDirection)
            unix_micros(col("_ts")) - unix_micros(col("_m")(matchedTsCol))
          else
            unix_micros(col("_m")(matchedTsCol)) - unix_micros(col("_ts"))
        when(col("_m").isNotNull && gapMicros <= secs * 1000000L, col("_m"))
      case None => col("_m")
    }

    val payloadFields = payloadType.asInstanceOf[StructType].fieldNames.toSeq
    val leftCols = left.columns.toSeq.map(c => col("_l")(c).as(c))
    val matchCols = payloadFields.map(f => col("_mt")(f).as(f))
    matched
      .withColumn("_mt", withinTol)
      .select((leftCols ++ matchCols): _*)
  }
}
