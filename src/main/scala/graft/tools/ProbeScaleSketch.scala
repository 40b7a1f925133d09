package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Kmv, Quantiles, RandomProjection, WeightedMinHash, Winnowing}

/** Scale probes for the r8 sketch/fingerprint newcomers that shipped
  * with argued (not measured) scale claims — planted-truth assertions
  * in the ProbeScaleSpans style. Iteration aid; not declared surface.
  *
  *  1. MOSS match pairs (q259): 50 K → 100 K docs, every doc carrying
  *     a UNIVERSAL 10-token passage (df = n fingerprints — the
  *     stop-word worst case the df-cap exists for) plus one planted
  *     16-token passage shared by each (2i, 2i+1) pair. Expected:
  *     EXACTLY n/2 pairs, each (even, even+1) with ≥ 3 shared
  *     fingerprints (coverage guarantee: 13 internal grams → 10 full
  *     windows → ≥ ⌈10/w⌉ = 3 distinct shared fingerprints); cost
  *     must stay ~linear in docs because universal fingerprints are
  *     dropped BEFORE pair generation.
  *  2. KMV distinct timeline (q258): 1 000 days × 10 K events/day
  *     (10 M rows, ~1 M distinct values). The r9 sketch-merge form
  *     must hold: corpus work is two aggregates; the cumulative
  *     merge is (D × D·k), value-count-independent. Asserts exact
  *     final count, a non-decreasing estimate curve, and the 3/√k
  *     error contract on the final day.
  *  3. Quantile normalization (q256): 10 M rows × 8 sources. The
  *     histogram form must keep the window over DISTINCT 6-dp scores
  *     (≤ 10⁶ per group at any corpus size): asserts row-preserving
  *     output, percentiles in [0, 1), and a planted constant-score
  *     group landing at percentile 0 for every member.
  */
object ProbeScaleSketch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-sketch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-scale-sketch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. MOSS match pairs with a universal (df = n) passage ──────
    val tokensPer = 60
    for (nDocs <- Seq(50000L, 100000L)) {
      val corpus = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(tokensPer - 1)), i =>
          when(i.between(10, 19), concat(lit("boiler"), i))
            .when(i.between(30, 45),
              concat(lit("pair"), col("id") / 2L cast "long", lit("_"), i))
            .otherwise(concat(lit("u"),
              xxhash64(col("id") * tokensPer + i, lit(17)))))).as("text"))
        .localCheckpoint() // corpus generation priced outside the probe

      val agg = t(s"MOSS matchPairs ($nDocs docs × $tokensPer tokens, " +
          "universal df=n passage + n/2 planted pairs)") {
        Winnowing.matchPairs(corpus, "doc_id", "text",
            k = 4, w = 4, minShared = 3, dfCap = 50)
          .agg(count(lit(1)), min(col("n_shared")),
            sum(when(col("id_b") === col("id_a") + 1L &&
              col("id_a") % 2L === 0L, 1L).otherwise(0L))).collect()(0)
      }
      assert(agg.getLong(0) == nDocs / 2 && agg.getLong(2) == nDocs / 2,
        s"expected exactly ${nDocs / 2} planted (even,even+1) pairs: $agg")
      assert(agg.getLong(1) >= 3L, s"coverage guarantee broken: $agg")
      println(s"[probe-scale-sketch] $nDocs docs: exactly ${agg.getLong(0)}" +
        s" pairs, min shared ${agg.getLong(1)} — PASS")
    }

    // ── 2. KMV timeline: 1 000 days × 10 K events/day ──────────────
    val nDays = 1000L
    val perDayRows = 10000L
    val userSpace = 1000000L
    val ev = spark.range(nDays * perDayRows).select(
      pmod(xxhash64(col("id"), lit(23)), lit(userSpace)).as("user_id"),
      timestamp_micros((col("id") / perDayRows).cast("long")
        * 86400000000L).as("ts"))
      .localCheckpoint()
    val exactDistinct = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    // the timeline's day domain is FIRST-SEEN days (a saturated late
    // day that introduces no new value adds no row — the declared
    // semantics); compute the expectation independently
    val expectDays = ev
      .select(col("user_id"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("_d"))
      .groupBy(col("user_id")).agg(min(col("_d")).as("_fd"))
      .select(countDistinct(col("_fd"))).collect()(0).getLong(0)
    val tl = t(s"KMV distinctTimeline ($nDays days × $perDayRows/day, " +
        s"$exactDistinct distinct)") {
      Kmv.distinctTimeline(ev, "user_id", "ts", k = 64)
        .orderBy(col("day")).collect()
    }
    assert(tl.length == expectDays,
      s"expected $expectDays first-seen timeline days: ${tl.length}")
    assert(tl.last.getLong(1) == exactDistinct,
      s"final exact-to-date ${tl.last.getLong(1)} != $exactDistinct")
    assert(tl.last.getBoolean(3),
      s"final-day estimate outside 3/sqrt(k): ${tl.last}")
    val nonDecreasing = tl.sliding(2).forall(w =>
      w(0).getDouble(2) <= w(1).getDouble(2) + 1e-9)
    assert(nonDecreasing, "KMV estimate curve must be non-decreasing")
    val outOfBound = tl.count(!_.getBoolean(3))
    println(s"[probe-scale-sketch] timeline: ${tl.length} first-seen days, final estimate " +
      f"${tl.last.getDouble(2)}%.0f vs exact $exactDistinct, " +
      s"$outOfBound/$nDays days outside 3/sqrt(k) — PASS")

    // ── 3. Quantile normalization at 10 M rows ─────────────────────
    val nRows = 10000000L
    val scored = spark.range(nRows).select(
      col("id"),
      concat(lit("src"), pmod(col("id"), lit(8))).as("source"),
      // source 7 is the planted constant-score group
      when(pmod(col("id"), lit(8)) === 7, lit(0.5))
        .otherwise(round(pmod(xxhash64(col("id"), lit(29)), lit(1000000L))
          .cast("double") / 1000000.0, 6)).as("score"))
      .localCheckpoint()
    val qn = t(s"quantileNormalize ($nRows rows × 8 sources)") {
      Quantiles.quantileNormalize(scored, "id", "source", "score")
        .agg(count(lit(1)), min(col("percentile")), max(col("percentile")),
          max(when(col("source") === "src7", col("percentile")))).collect()(0)
    }
    assert(qn.getLong(0) == nRows, s"row-preserving violated: $qn")
    assert(qn.getDouble(1) >= 0.0 && qn.getDouble(2) < 1.0,
      s"percentile out of [0,1): $qn")
    assert(qn.getDouble(3) == 0.0,
      s"constant-score group must land at percentile 0: $qn")
    println(s"[probe-scale-sketch] quantileNormalize: $nRows rows, " +
      s"percentiles [${qn.getDouble(1)}, ${qn.getDouble(2)}] — PASS")

    // ── 4. JL projection at 100 K × 64-dim vectors ─────────────────
    val nVecs = 100000L
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(xxhash64(col("id") * 64L + i, lit(31)), lit(2000001L))
          .cast("double") / 1000000.0 - 1.0).cast("float")).as("embedding"))
      .localCheckpoint()
    val jl = t(s"JL project ($nVecs vecs, 64 → 16 dims)") {
      RandomProjection.project(vecs, "vec_id", "embedding",
          inDims = 64, outDims = 16)
        .agg(count(lit(1)), countDistinct(col("vec_id"))).collect()(0)
    }
    assert(jl.getLong(0) == nVecs * 16 && jl.getLong(1) == nVecs,
      s"expected ${nVecs * 16} projected components: $jl")
    println(s"[probe-scale-sketch] JL: ${jl.getLong(0)} components " +
      s"over ${jl.getLong(1)} vectors — PASS")

    // ── 5. Weighted MinHash pair verify at 50 K → 100 K docs ──────
    // every doc pairs with its sibling (2m, 2m+1); even m siblings
    // are identical multisets (exact = est = 1.0), odd m siblings
    // share nothing (exact = 0.0) — both asserted, cost ~linear
    for (nDocs <- Seq(50000L, 100000L)) {
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(39)), i =>
          when((col("id") / 2L).cast("long") % 2L === 0L,
            concat(lit("tok"), (col("id") / 2L).cast("long"), lit("_"),
              pmod(i, lit(10)))) // 10 distinct tokens, tf 4 each
            .otherwise(concat(lit("u"),
              xxhash64(col("id") * 40L + i, lit(41)))))).as("text"))
        .localCheckpoint()
      val pairs = spark.range(nDocs / 2).select(
        (col("id") * 2L).as("id_a"), (col("id") * 2L + 1L).as("id_b"))
      val agg = t(s"weighted minhash pair verify ($nDocs docs, " +
          s"${nDocs / 2} pairs)") {
        WeightedMinHash.pairJaccard(docs, "doc_id", "text", pairs)
          .agg(count(lit(1)),
            sum(when(col("exact_jaccard") === 1.0 &&
              col("est_jaccard") === 1.0, 1L).otherwise(0L)),
            sum(when(col("exact_jaccard") === 0.0, 1L).otherwise(0L)))
          .collect()(0)
      }
      assert(agg.getLong(0) == nDocs / 2, s"pair count: $agg")
      assert(agg.getLong(1) == nDocs / 4 && agg.getLong(2) == nDocs / 4,
        s"expected ${nDocs / 4} identical + ${nDocs / 4} disjoint: $agg")
      println(s"[probe-scale-sketch] $nDocs docs: ${agg.getLong(1)} " +
        s"identical + ${agg.getLong(2)} disjoint pairs exact — PASS")
    }

    spark.stop()
  }
}
