package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

/** Scale probe for the r7 text/dedup/ordering operators — measures,
  * instead of arguing, their behavior ~10× above sf0.1:
  *
  *   1. Inverted-index Jaccard at 50 K docs × 60 grams with a 600 K
  *      vocabulary (mean df ≈ 5 — the Heaps-regime selectivity real
  *      trigram sets have, unlike this corpus's 31-word vocab), with
  *      500 planted duplicate pairs the run must find exactly.
  *   2. globalOrderRank at 10 M rows: exact 1..N two-level rank.
  *   3. topFractionByScore at 10 M rows with ~1 M distinct scores —
  *      prices the documented driver-histogram bound at its design
  *      maximum.
  *
  * Synthetic inputs by deterministic hash — generated in-cluster, no
  * testdata writes. Results recorded in BASELINE.md. Iteration aid;
  * not part of the declared surface.
  */
object ProbeScaleText {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-text")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-scale-text] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. inverted-index Jaccard, 50 K docs, mean df ≈ 5 ─────────────
    val nDocs = 50000L
    val gramsPer = 60
    val vocab = 600000L
    val nPlanted = 500L
    // docs [25000, 25000+nPlanted) replay the gram stream of doc-25000
    def sets = spark.range(nDocs).select(
      col("id").as("doc_id"),
      array_distinct(transform(sequence(lit(0), lit(gramsPer - 1)), i =>
        concat(lit("g"), pmod(xxhash64(
          when(col("id").between(25000L, 25000L + nPlanted - 1L),
            col("id") - 25000L).otherwise(col("id")) * gramsPer + i,
          lit(7)), lit(vocab))))).as("grams"))

    val pairs = t(s"indexed jaccard ($nDocs docs, ${gramsPer}/doc, vocab $vocab)") {
      Dedup.jaccardPairsIndexed(sets, "doc_id", "grams", 0.9).count()
    }
    println(s"[probe-scale-text] jaccard pairs found=$pairs planted=$nPlanted")

    // ── 2. exact global order at 10 M rows ─────────────────────────────
    val nRows = 10000000L
    val order = t(s"globalOrderRank ($nRows rows, 64 partitions)") {
      Sampling.globalOrderRank(spark.range(nRows).toDF("id"), "id",
        "probe_v1", partitions = 64)
    }
    val chk = order.agg(count(lit(1)).as("n"), max(col("train_order")).as("mx"),
      countDistinct(col("train_order")).as("d")).collect()(0)
    println(s"[probe-scale-text] order n=${chk.getLong(0)} max=${chk.getLong(1)} distinct=${chk.getLong(2)}")

    // ── 3. quality gate at 10 M rows, ~1 M distinct scores ────────────
    val gated = t(s"topFractionByScore ($nRows rows, ~1M distinct scores, p=0.1)") {
      Sampling.topFractionByScore(
        spark.range(nRows).select(col("id"),
          (pmod(col("id"), lit(1000003L)).cast("double") / 1000003.0).as("score")),
        "id", "score", 0.1).count()
    }
    println(s"[probe-scale-text] gate kept=$gated expected=${math.ceil(nRows * 0.1).toLong}")

    // ── 4. prefix-filtered containment: growth + stop-word immunity ──
    // Every doc carries a UNIVERSAL gram (df = n) on top of a
    // selective tail (mean df ≈ 5). The pre-r8 full-postings self-join
    // would generate n²/2 candidates from that one element alone
    // (1.25 B rows at 50 K docs — infeasible); the prefix filter never
    // selects it (at t = 0.9 a 31-gram set joins only its 4 rarest
    // elements), so completing in seconds at all IS the df-cap
    // evidence. Two scales measure the growth exponent: sub-quadratic
    // means the time ratio tracks the doc ratio, not its square.
    // Docs [10000, 10000+nCont) replay the first 21 grams of
    // doc-10000's stream plus one own gram → contained in doc 10000
    // at 21/22 ≈ 0.955 ≥ 0.9 (and pairwise among themselves).
    val nCont = 500L
    def contSets(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      array_distinct(concat(
        filter(transform(sequence(lit(0), lit(29)), i => {
          val planted = col("id").between(10000L, 10000L + nCont - 1L)
          // planted docs carry ONLY the first 21 grams of doc-10000's
          // stream (a strict subset → containment 22/22 with g_stop)
          when(planted && i >= 21, lit(null).cast("string"))
            .when(planted,
              concat(lit("g"), pmod(xxhash64(lit(10000L) * 30 + i, lit(7)),
                lit(vocab))))
            .otherwise(concat(lit("g"), pmod(xxhash64(col("id") * 30 + i,
              lit(7)), lit(vocab))))
        }), x => x.isNotNull),
        array(lit("g_stop")))).as("grams"))
    for (n <- Seq(25000L, 50000L)) {
      val found = t(s"containment prefix-filter ($n docs, universal gram, t=0.9)") {
        Dedup.containmentPairsIndexed(contSets(n), "doc_id", "grams", 0.9)
          .count()
      }
      println(s"[probe-scale-text] containment n=$n pairs=$found")
    }

    spark.stop()
  }
}
