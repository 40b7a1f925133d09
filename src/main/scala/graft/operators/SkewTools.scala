package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB.
  *
  * AQE's skew-join split handles most runtime skew; these are the
  * explicit tools for the cases AQE cannot fix: a grouped aggregation
  * whose hot key overwhelms one reducer, and a join against a
  * dimension where a handful of keys dominate.
  */
object SkewTools {

  /** Two-phase (salted) aggregation: groupBy(keys + salt) partial →
    * groupBy(keys) final. Works for any commutative aggregates passed
    * as (partial, final) pairs on the SAME column names.
    *
    * Example: saltedAgg(df, Seq("k"), 32,
    *   Seq(count(lit(1)).as("n")), Seq(sum(col("n")).as("n")))
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partial: Seq[Column],
      fin: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)

  /** Salted join against a small-ish right side: the left side's hot
    * keys are spread over `saltBuckets` partitions; the right side is
    * replicated once per bucket. Right must be small enough to
    * replicate (dim-table case) — for two large skewed sides, rely on
    * AQE skew-join instead.
    */
  def saltedBroadcastJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(broadcast(replicatedRight), Seq(key, "_salt"))
      .drop("_salt")
  }
}
