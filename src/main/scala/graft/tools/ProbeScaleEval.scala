package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Hits, TextEval}

/** Scale probe for the round-10 heavy text-eval/graph newcomers —
  * measures, instead of arguing, their behavior at 2-4× the sf0.1
  * bench volume, with PLANTED truths the run must reproduce exactly:
  *
  *   1. chrF at 10 K and 20 K pairs of ~160-char strings: even ids
  *      are identical pairs (their clipped mass is closed-form),
  *      odd ids share no characters at all (contribute totals only)
  *      — every per-order F is asserted against the exact formula.
  *   2. ROUGE-L at 10 K and 20 K pairs of 24/28-token sequences:
  *      even ids share the full 24-token prefix (LCS = 24), odd ids
  *      are disjoint (LCS = 0) — ΣLCS asserted exactly.
  *   3. HITS on complete bipartite graphs (1 M and 2 M edges):
  *      regularity forces every hub to EXACTLY (N·10⁶) div S and
  *      every authority to (N·10⁶) div P after any round count.
  *
  * Synthetic inputs by deterministic hash — generated in-cluster, no
  * testdata writes. Results recorded in BASELINE.md. Iteration aid;
  * not part of the declared surface.
  */
object ProbeScaleEval {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-eval")
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
      println(f"[probe-scale-eval] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. chrF: identical evens, disjoint odds ───────────────────────
    // even doc: cand = ref = 5×md5(id) = 160 hex chars
    // odd doc:  cand = 'x'*150, ref = 'y'*140 (zero shared grams)
    def chrfPairs(n: Long) = spark.range(n).select(
      col("id"),
      when(pmod(col("id"), lit(2)) === 0,
        repeat(md5(col("id").cast("string")), 5))
        .otherwise(repeat(lit("x"), 150)).as("cand"),
      when(pmod(col("id"), lit(2)) === 0,
        repeat(md5(col("id").cast("string")), 5))
        .otherwise(repeat(lit("y"), 140)).as("ref"))
    for (n <- Seq(10000L, 20000L)) {
      val rows = t(s"chrF ($n pairs, 160/150/140 chars)") {
        TextEval.chrfCorpus(chrfPairs(n), "id", "cand", "ref")
          .collect().map(r => r.getInt(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
          .toMap
      }
      val ev = n / 2; val od = n - ev
      for (o <- 1 to 6) {
        val m = ev * (160L - o + 1)
        val c = m + od * (150L - o + 1)
        val rr = m + od * (140L - o + 1)
        val (gm, gc, gr, gf) = rows(o)
        assert(gm == m && gc == c && gr == rr,
          s"order $o counts: got ($gm,$gc,$gr) want ($m,$c,$rr)")
        val f = 5.0 * m / (4.0 * rr + c)
        assert(math.abs(gf - f) < 1e-12, s"order $o F: $gf vs $f")
      }
    }

    // ── 2. ROUGE-L: full-prefix evens, disjoint odds ──────────────────
    def rougePairs(n: Long) = spark.range(n).select(
      col("id"),
      when(pmod(col("id"), lit(2)) === 0,
        transform(sequence(lit(1), lit(24)),
          i => concat(lit("t"), pmod(col("id") * 31 + i, lit(999)))))
        .otherwise(transform(sequence(lit(1), lit(24)),
          i => concat(lit("a"), i))).as("cand"),
      when(pmod(col("id"), lit(2)) === 0,
        transform(sequence(lit(1), lit(28)),
          i => concat(lit("t"), pmod(col("id") * 31 + least(i, lit(24)),
            lit(999)))))
        .otherwise(transform(sequence(lit(1), lit(28)),
          i => concat(lit("b"), i))).as("ref"))
    for (n <- Seq(10000L, 20000L)) {
      val r = t(s"ROUGE-L ($n pairs, 24/28 tokens)") {
        TextEval.rougeLCorpus(rougePairs(n), "id", "cand", "ref")
          .collect()(0)
      }
      // evens: the cand tokens all appear in-order in ref (ref's
      // tail repeats token 24, which the LCS may reuse once at most
      // — cand has ONE copy of t24, so LCS is exactly 24)
      assert(r.getLong(1) == 24L * (n / 2),
        s"lcs ${r.getLong(1)} want ${24L * (n / 2)}")
    }

    // ── 3. HITS: complete bipartite regularity ────────────────────────
    // 8 rounds is the FULL `require` envelope: with the every-2-round
    // renormalization, K_{2000,500} density must survive all 8 (the
    // r10 single-mid-point placement overflowed 38 digits on the
    // rounds-5-8 stretch — exactly the window ADVICE r10 flagged; the
    // normalize raise_error would now fail this probe loudly).
    for ((s0, p0) <- Seq((2000L, 500L), (2000L, 1000L));
         rounds <- Seq(4, 8)) {
      val edges = spark.range(s0 * p0).select(
        (col("id") / p0).cast("long").as("src"),
        (lit(s0) + pmod(col("id"), lit(p0))).as("dst"))
      val out = t(s"HITS $rounds rounds (K_{$s0,$p0}: ${s0 * p0} edges)") {
        Hits.microHits(edges, rounds).collect()
      }
      val nTot = s0 + p0
      val hub = nTot * 1000000L / s0
      val auth = nTot * 1000000L / p0
      assert(out.forall { r =>
        val (node, h, a) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (node < s0) h == hub && a == 0L else h == 0L && a == auth
      }, s"regular-graph invariant broken (want hub=$hub auth=$auth)")
    }

    println("[probe-scale-eval] all planted truths exact")
    spark.stop()
  }
}
