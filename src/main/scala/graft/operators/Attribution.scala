package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing / conversion attribution over event streams. */
object Attribution {

  /** Linear multi-touch attribution LEDGER: every conversion's value
    * is split equally across the same key's touches inside the
    * strict-before lookback window `touchTs ∈ [convTs − lookback,
    * convTs)`; one output row per (conversion, touch) pair carries
    * `share = round(value / n_touches, 6)`. The ledger form (pair
    * rows, single division, no share summation) is deliberate:
    * downstream rollups can aggregate shares however they like, and
    * the operator itself emits no order-dependent float sum.
    *
    * Scale shape: the lookback join is BANDED, not a nested loop —
    * both sides bucket to `floor(µs / lookback)`, touches replicate
    * into (b, b+1) (a strict-before window of length L spans at most
    * two L-buckets), the join runs as a plain equi join on
    * (keys…, bucket) and the exact µs predicate prunes candidates.
    * The per-conversion touch count is a window over the pair frame
    * partitioned by the conversion id — bounded by touches-per-
    * conversion, never a global sort.
    *
    * @param conversions must carry a unique `convId` column
    * @param touches    must carry a unique `touchId` column; non-key
    *                   columns must not collide with `conversions`
    */
  def linearTouches(
      conversions: DataFrame,
      touches: DataFrame,
      keys: Seq[String],
      convId: String,
      convTs: String,
      touchTs: String,
      valueCol: String,
      lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0, "lookback must be positive")
    val tolUs = lookbackSeconds * 1000000L
    // FLOOR division, not `div` (which truncates toward zero): for
    // pre-1970 timestamps truncation would shift a bucket boundary
    // and break the (b, b+1) replication invariant the banded join
    // relies on. `x - pmod(x, t)` is the largest multiple of t <= x,
    // exact in long arithmetic (no double round-trip).
    def floorDiv(ts: String): String =
      s"(unix_micros($ts) - pmod(unix_micros($ts), ${tolUs}L)) div ${tolUs}L"
    val l = conversions
      .withColumn("_b", expr(floorDiv(convTs)))
    val r = touches
      .withColumn("_b0", expr(floorDiv(touchTs)))
      .withColumn("_b", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    val pairs = l.join(r, keys :+ "_b")
      .filter(
        unix_micros(col(touchTs)) < unix_micros(col(convTs)) &&
        unix_micros(col(touchTs)) >= unix_micros(col(convTs)) - tolUs)
      .drop("_b")
    val perConv = Window.partitionBy(col(convId))
    pairs
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .withColumn("share",
        round(col(valueCol).cast("double") / col("n_touches"), 6))
  }
}
