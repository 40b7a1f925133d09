package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: attach to every left row the single most
  * recent right row with the same key and `rightTs <= leftTs`
  * (`strict = true` ⇒ `<`). The classic time-series enrichment
  * operator (trades→quotes, events→state) that Spark has no native
  * relational operator for.
  *
  * Implementation is a tagged union + one window pass, not a range
  * join: both sides are unioned on an aligned schema, shuffled ONCE by
  * the key, sorted by (ts, side, tie-break), and the right payload is
  * propagated forward with `last(_, ignoreNulls = true)` over an
  * unbounded-preceding row frame. Left rows then read the latest
  * preceding payload directly.
  *
  * Scale notes (100 TB): cost is a single hash-partition shuffle of
  * |L| + |R| rows plus a per-partition sort — the same shape as a
  * sort-merge join, with no N×M candidate blow-up for wide time
  * tolerances and no per-key driver loops. Skewed keys can be salted
  * upstream with [[SkewTools]]; AQE handles moderate skew.
  *
  * Determinism: ties on `rightTs` are pinned by `tieBreakCol`
  * (ascending; the LAST one under the frame wins, i.e. the max
  * tie-break value at the winning timestamp).
  */
object AsOfJoin {

  /** @param rightPayload right-side columns to carry (must not collide
    *                     with left column names)
    * @param matchedTsCol output name for the matched right timestamp
    *                     (null when no match)
    * @param tolerance    optional max `leftTs - rightTs` in seconds;
    *                     matches older than this are nulled out
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
      tolerance: Option[Long] = None): DataFrame = {

    val payloadStruct = struct(
      (rightPayload.map(col) :+ col(rightTs).as(matchedTsCol)): _*)
    val payloadType = right.select(payloadStruct.as("_p")).schema("_p").dataType
    val lrowStruct = struct(left.columns.toSeq.map(col): _*)
    val lrowType = left.select(lrowStruct.as("_l")).schema("_l").dataType

    // Right rows must sort BEFORE left rows at equal ts for <= (side 0
    // vs 1), AFTER them for strict < (side 2 vs 1).
    val rightSide = if (strict) 2 else 0

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
        lit(null).cast(right.schema(tieBreakCol).dataType).as("_tb"),
        lit(null).cast(payloadType).as("_p"),
        lrowStruct.as("_l")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val withinTol = tolerance match {
      case Some(secs) =>
        when(col("_m").isNotNull &&
          unix_micros(col("_ts")) - unix_micros(col("_m")(matchedTsCol)) <= secs * 1000000L,
          col("_m"))
      case None => col("_m")
    }

    val payloadFields =
      payloadType.asInstanceOf[StructType].fieldNames.toSeq
    val leftCols = left.columns.toSeq.map(c => col("_l")(c).as(c))
    val matchCols = payloadFields.map(f => col("_mt")(f).as(f))
    matched
      .withColumn("_mt", withinTol)
      .select((leftCols ++ matchCols): _*)
  }

  /** Forward as-of join: earliest right row with `rightTs >= leftTs`
    * (`strict` ⇒ `>`). Mirror image of [[backward]] — same single
    * shuffle, descending scan via a following-frame `first`.
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
      tolerance: Option[Long] = None): DataFrame = {

    val payloadStruct = struct(
      (rightPayload.map(col) :+ col(rightTs).as(matchedTsCol)): _*)
    val payloadType = right.select(payloadStruct.as("_p")).schema("_p").dataType
    val lrowStruct = struct(left.columns.toSeq.map(col): _*)
    val lrowType = left.select(lrowStruct.as("_l")).schema("_l").dataType

    // Right rows must sort AFTER left rows at equal ts for >= (side 2),
    // BEFORE for strict > is wrong — strict means equal-ts right rows
    // must not match, so they sort before left (side 0) and the
    // following frame starting at the next row skips them.
    val rightSide = if (strict) 0 else 2

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
        lit(null).cast(right.schema(tieBreakCol).dataType).as("_tb"),
        lit(null).cast(payloadType).as("_p"),
        lrowStruct.as("_l")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("_m", first(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val withinTol = tolerance match {
      case Some(secs) =>
        when(col("_m").isNotNull &&
          unix_micros(col("_m")(matchedTsCol)) - unix_micros(col("_ts")) <= secs * 1000000L,
          col("_m"))
      case None => col("_m")
    }

    val payloadFields =
      payloadType.asInstanceOf[StructType].fieldNames.toSeq
    val leftCols = left.columns.toSeq.map(c => col("_l")(c).as(c))
    val matchCols = payloadFields.map(f => col("_mt")(f).as(f))
    matched
      .withColumn("_mt", withinTol)
      .select((leftCols ++ matchCols): _*)
  }
}
