package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal calibration (Vovk et al.; Papadopoulos et al.
  * 2002) — the distribution-free prediction-set recipe an eval stack
  * runs on top of any scored model: hold out a calibration split,
  * take the ⌈(n+1)(1−α)⌉-th smallest nonconformity score as the
  * threshold q̂, and report the held-out coverage of {s ≤ q̂}
  * (guaranteed ≥ 1−α in expectation, no model assumptions).
  *
  * Exactness: scores arrive on the caller's 1e-6 integer lattice;
  * the split is the portable md5 parity; the rank index
  * k = ((n+1)·(den−num) + den−1) div den is exact integer ceiling
  * arithmetic for α = num/den; q̂ is an order statistic read off the
  * score HISTOGRAM (never a per-row rank), and coverage is one
  * division of exact integers.
  *
  * Scale shape: one count aggregate collapses the corpus to the
  * ≤ 10⁶+1-row score histogram (domain-bounded, the q298 trick), the
  * cumulative walk is a single-partition window over that bounded
  * frame only, and the test-side coverage is one more map-side
  * aggregate against the broadcast 1-row threshold.
  */
object Conformal {

  /** One-row report: (n_cal, n_test, k, qhat6, qhat, n_covered,
    * coverage). `scoreCol` must be an exact integer score on the
    * 1e-6 lattice (0..10⁶). A degenerate calibration split smaller
    * than k yields a null q̂ and zero coverage (the `s ≤ null`
    * comparison is null → counted 0 — both engines agree).
    */
  def splitConformal(df: DataFrame, idCol: String, scoreCol: String,
      alphaNum: Int, alphaDen: Int, splitSalt: String): DataFrame = {
    require(alphaDen > alphaNum && alphaNum >= 1,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum
    val isCal = pmod(conv(substring(md5(concat(
      col(idCol).cast("string"), lit(":" + splitSalt))), 1, 15),
      16, 10).cast("long"), lit(2L)) === 0
    val base = df.select(col(scoreCol).cast("long").as("_s6"),
      isCal.as("_cal"))

    val hist = base.filter(col("_cal"))
      .groupBy(col("_s6")).agg(count(lit(1)).as("_n"))
    // bounded single-partition walk: ≤ lattice-domain rows
    val wCum = Window.orderBy(col("_s6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum(col("_n")).over(wCum))

    val kRow = base.agg(
      sum(when(col("_cal"), 1L).otherwise(0L)).as("n_cal"),
      sum(when(!col("_cal"), 1L).otherwise(0L)).as("n_test"))
      .withColumn("k",
        expr(s"((n_cal + 1) * $keep + $alphaDen - 1) div $alphaDen"))
    val qhat = cum.crossJoin(broadcast(kRow))
      .agg(min(when(col("_cum") >= col("k"), col("_s6"))).as("qhat6"))

    base.filter(!col("_cal"))
      .crossJoin(broadcast(qhat))
      .agg(sum(when(col("_s6") <= col("qhat6"), 1L).otherwise(0L))
        .as("n_covered"),
        min(col("qhat6")).as("qhat6"))
      .crossJoin(broadcast(kRow))
      .select(col("n_cal"), col("n_test"), col("k"), col("qhat6"),
        (col("qhat6").cast("double") / lit(1000000.0)).as("qhat"),
        col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }
}
