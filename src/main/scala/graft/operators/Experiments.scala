package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment analysis: deterministic hash-split A/B arms and the
  * two-proportion summary (rates, lift, pooled z statistic) — the
  * measurement half of online experimentation, computed exactly from
  * a single scan's integer counts.
  *
  * Determinism: arm assignment is the q94 portable-md5 idiom (hex
  * prefix vs literal threshold — '8000' = exactly 1/2), so a unit's
  * arm is a pure function of (id, salt), stable under corpus growth
  * and identical in any engine. The four counts (n, conversions per
  * arm) are exact integers; every derived statistic is ONE pinned
  * IEEE chain over those integers, spelled identically in the SQL
  * oracle — no variance estimate ever touches per-row floats.
  *
  * Scale shape: one map-side-combined aggregate over the joined
  * (unit, converted) frame → a single row; the conversion flag
  * arrives via a distinct-key semi-join shape (conversions table is
  * grouped to distinct unit ids before the join).
  */
object Experiments {

  /** 'A'/'B' by the portable md5 hex-threshold coin (exactly half
    * the hash space each).
    */
  def abArm(id: Column, salt: String): Column =
    when(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4)
      < "8000", lit("A")).otherwise(lit("B"))

  /** One summary row from (armCol ∈ {'A','B'}, convCol boolean):
    * counts, rates, relative lift of B over A, and the pooled
    * two-proportion z statistic.
    */
  def twoProportions(df: DataFrame, armCol: String,
      convCol: String): DataFrame = {
    val m = df.agg(
      count(when(col(armCol) === "A", lit(1))).as("n_a"),
      count(when(col(armCol) === "B", lit(1))).as("n_b"),
      count(when(col(armCol) === "A" && col(convCol), lit(1))).as("conv_a"),
      count(when(col(armCol) === "B" && col(convCol), lit(1))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    m.select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      pa.as("rate_a"), pb.as("rate_b"),
      (pb / pa - lit(1.0)).as("lift"),
      ((pb - pa) / sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n_a").cast("double") +
         lit(1.0) / col("n_b").cast("double")))).as("z"))
  }
}
