package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{PortableMinHash, Ranks}

/** Scale probes for the r8 rank/incremental families:
  *
  *   1. Ranks.globalRankBy at 10 M rows under an ARBITRARY skewed
  *      key (not the hash-uniform special case globalOrderRank
  *      already proved): ranks must be exactly 1..N.
  *   2. snakeShards at 10 M rows / 64 shards over Zipf-ish weights:
  *      the max/min shard-total imbalance must stay under 1 %.
  *   3. Incremental near-dup: a 5 K-doc batch against a 50 K-doc
  *      base with 500 planted batch↔base duplicates — must find
  *      exactly the planted pairs, and the cost is the point: the
  *      candidate join is bounded by batch-side bands, not base².
  *
  * Synthetic inputs by deterministic hash; results recorded in
  * BASELINE.md. Iteration aid; not part of the declared surface.
  */
object ProbeScaleRank {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-rank")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-scale-rank] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. exact 10 M global rank under a skewed key ─────────────────
    val n = 10000000L
    val rows = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000L)).as("k"))
      .localCheckpoint()
    val ranked = t(s"globalRankBy ($n rows, 1000-value skewed key)") {
      val r = Ranks.globalRankBy(rows, "id", "rank",
        Seq(col("k")), partitions = 64)
      val agg = r.agg(count(lit(1)), min(col("rank")), max(col("rank")),
        countDistinct(col("rank"))).collect()(0)
      agg
    }
    assert(ranked.getLong(0) == n && ranked.getLong(1) == 1L &&
      ranked.getLong(2) == n && ranked.getLong(3) == n,
      s"rank must be exactly 1..$n: $ranked")
    println(s"[probe-scale-rank] rank exact 1..$n — PASS")

    // ── 2. snake-shard balance at 10 M rows / 64 shards ──────────────
    val weighted = spark.range(n).select(col("id"),
      (pmod(xxhash64(col("id"), lit(5)), lit(1000L)) + 1L).as("w"))
      .localCheckpoint()
    val balance = t(s"snakeShards ($n rows, 64 shards)") {
      Ranks.snakeShards(weighted, "id", "w", shards = 64)
        .groupBy(col("shard")).agg(sum(col("w")).as("tot"))
        .collect().map(_.getLong(1))
    }
    val imb = (balance.max - balance.min).toDouble / balance.min
    assert(balance.length == 64 && imb < 0.01,
      s"64 shards within 1%: imbalance $imb")
    println(f"[probe-scale-rank] shard imbalance $imb%.5f — PASS")

    // ── 3. incremental near-dup: 5 K batch vs 50 K base ──────────────
    def corpus(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)), i =>
        concat(lit("w"), xxhash64(col("seed") * 40 + i, lit(11))))).as("text"))
    val base = corpus(spark.range(50000L)
      .select(col("id"), col("id").as("seed"))).localCheckpoint()
    // batch docs 0-499 replay base docs 0-499's token stream → planted
    // duplicates; the rest are novel
    val batch = corpus(spark.range(1000000L, 1005000L)
      .select(col("id"), when(col("id") < 1000500L, col("id") - 1000000L)
        .otherwise(col("id")).as("seed"))).localCheckpoint()
    val pairs = t("incremental near-dup (5K batch vs 50K base)") {
      PortableMinHash.incrementalNearDupPairs(base, batch,
        "doc_id", "text")
        .agg(count(lit(1)),
          sum(when(col("pair_kind") === "batch_vs_base", 1L).otherwise(0L)))
        .collect()(0)
    }
    assert(pairs.getLong(0) == 500L && pairs.getLong(1) == 500L,
      s"exactly the 500 planted cross pairs: $pairs")
    println(s"[probe-scale-rank] 500/500 planted batch-vs-base pairs — PASS")
    spark.stop()
  }
}
