package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-interval (range) join: all (left, right) pairs with equal keys
  * whose timestamps lie within a tolerance of each other. Spark's
  * planner turns a raw `|l.ts - r.ts| <= tol` join condition into a
  * cross/nested-loop join — quadratic per key. This operator makes it
  * an EQUI join by time-bucketing:
  *
  * each side is bucketed to `floor(ts / tol)`; the right side is
  * replicated into its own bucket ± 1 (any pair within `tol` differs
  * by at most one bucket), the join runs on (keys…, bucket) through
  * the normal hash-shuffle machinery, and the exact predicate filters
  * the candidates. Cost: one equi-join shuffle of |L| + 3|R| rows —
  * no candidate blow-up beyond the 3× replication, skew handled by
  * AQE like any other equi join.
  *
  * Each qualifying pair appears exactly once (the left row has one
  * bucket; the right row's three replicas carry distinct buckets).
  */
object RangeJoin {

  /** @param tolSeconds inclusive tolerance |l.ts - r.ts| <= tolSeconds.
    * Right-side columns must not collide with left's (rename first).
    * All arithmetic is exact integer microseconds (`unix_micros`), so
    * sub-second timestamps bucket and compare without float boundary
    * drift. Assumes post-1970 timestamps (integral `div` truncation ==
    * floor for non-negative epochs).
    */
  def withinTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolSeconds: Long): DataFrame = {
    require(tolSeconds > 0, "tolerance must be positive")
    val tolMicros = tolSeconds * 1000000L
    val l = left.withColumn("_b", expr(s"unix_micros($leftTs) div ${tolMicros}L"))
    val r = right.withColumn("_b0", expr(s"unix_micros($rightTs) div ${tolMicros}L"))
      .withColumn("_b", explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    l.join(r, keys :+ "_b")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolMicros)
      .drop("_b")
  }
}
