package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
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
    // 4× leg (r11 verdict item 5): q310 is the board's dearest
    // non-iterative line — assert the per-pair fold stays LINEAR in
    // pair volume (the DP is O(|C|·|R|²) per pair but |C|,|R| are
    // caller-bounded constants, so corpus wall must scale with n).
    // A quadratic regression would show ~16× wall at the 4× leg; the
    // 8× gate is generous for scheduler noise yet catches it.
    val rougeWalls = for (n <- Seq(10000L, 20000L, 40000L)) yield {
      // min of 2 runs per leg: the gate below compares wall-clock
      // ratios, and a single run can draw a scheduler hiccup that
      // fails the ratio on a busy host even though the kernel is
      // linear (ADVICE r12) — min is the noise-robust wall statistic
      val walls = for (_ <- 1 to 2) yield {
        val t0 = System.nanoTime()
        val r = t(s"ROUGE-L ($n pairs, 24/28 tokens)") {
          TextEval.rougeLCorpus(rougePairs(n), "id", "cand", "ref")
            .collect()(0)
        }
        // evens: the cand tokens all appear in-order in ref (ref's
        // tail repeats token 24, which the LCS may reuse once at most
        // — cand has ONE copy of t24, so LCS is exactly 24)
        assert(r.getLong(1) == 24L * (n / 2),
          s"lcs ${r.getLong(1)} want ${24L * (n / 2)}")
        (System.nanoTime() - t0) / 1e9
      }
      walls.min
    }
    assert(rougeWalls(2) <= 8.0 * math.max(rougeWalls(0), 0.2),
      s"ROUGE-L wall superlinear across 4x volume: $rougeWalls")

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

    // ── 4. SemDeDup: Σ|cell|² stays linear at 10-40× volume ──────────
    // Corpus: signed md5-uniform 16-dim vectors (pairwise cosines
    // concentrate near 0), a 6% near-identical hot cluster (all
    // mutual cosines ≈ 1), and the first 1000 ids planted as exact
    // twin pairs (2i, 2i+1 identical). Threshold 0.99 means the ONLY
    // duplicates are twins and hot-cluster cell-mates, so the
    // planted truths are: every odd twin is a dup of exactly its
    // even partner, and the hot cluster's keep-count equals its
    // final-cell count. Two legs per volume:
    //   - adaptive first level (nlist=0): cells track targetCellSize
    //     as n grows — no quadratic anywhere without a second level
    //   - deliberately undersized first level (nlist=16): every cell
    //     breaches 2·target, forcing the second-level split — the
    //     Σ|cell|² bound must then come from the split alone
    val tgt = 256L
    def vecExpr(idc: Column): Column = {
      // 16 signed doubles per id from two md5 draws (8 hex chars →
      // uniform in [-1,1]); the hot cluster (6% of ids, chosen by a
      // THIRD independent draw so twin pairs stay out) collapses
      // onto one direction with an id-proportional 1e-6 jitter
      def u(seed: String) = (0 until 8).map { i =>
        (conv(substring(md5(concat(idc.cast("string"), lit(seed))),
          i * 4 + 1, 4), 16, 10).cast("double") / 32767.5) - 1.0
      }
      val base = array((u("a") ++ u("b")).map(_.cast("float")): _*)
      val hotv = array((Seq(
        lit(10.0) + idc.cast("double") * 1e-6,
        lit(10.0) - idc.cast("double") * 1e-6) ++
        Seq.fill(14)(lit(0.0))).map(_.cast("float")): _*)
      when(idc >= 1000 &&
        substring(md5(concat(idc.cast("string"), lit("hot"))), 1, 2) < "10",
        hotv).otherwise(base)
    }
    for (n <- Seq(20000L, 80000L); forcedNlist <- Seq(0, 16)) {
      val vecs = spark.range(n).select(col("id").as("vec_id"),
        vecExpr(col("id")).as("embedding"))
        .withColumn("embedding",
          when(col("vec_id") < 1000 && pmod(col("vec_id"), lit(2)) === 1,
            vecExpr(col("vec_id") - 1)).otherwise(col("embedding")))
        .localCheckpoint()
      val label = if (forcedNlist == 0) "adaptive nlist"
        else s"forced nlist=$forcedNlist (every cell splits)"
      val out = t(s"SemDeDup $n vectors, target cell $tgt, $label") {
        graft.operators.SemanticDedup.semanticDedup(
          vecs, "vec_id", "embedding", nlist = forcedNlist,
          threshold = 0.99, targetCellSize = tgt)
          .localCheckpoint()
      }
      // planted truth 1: odd twins are duplicates of exactly their
      // even partner (nothing else reaches cosine 0.99 for them)
      val twins = out.filter(col("vec_id") < 1000 &&
        pmod(col("vec_id"), lit(2)) === 1)
      val twinBad = twins.filter(col("dup_of").isNull ||
        col("dup_of") =!= col("vec_id") - 1).count()
      assert(twinBad == 0L, s"$twinBad twins mis-deduped")
      // planted truth 2: hot-cluster survivors = its final cells
      val hot = out.filter(col("vec_id") >= 1000 &&
        substring(md5(concat(col("vec_id").cast("string"), lit("hot"))),
          1, 2) < "10")
      val hotKeep = hot.filter(col("keep")).count()
      val hotCells = hot.select("cell").distinct().count()
      assert(hotKeep == hotCells,
        s"hot survivors $hotKeep != hot cells $hotCells")
      // the scale bound: Σ|cell|² ≤ n · 4·target — linear in n with a
      // constant tied to the target, never to the corpus
      val sq = out.groupBy("cell").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("s"), max(col("c")).as("m"))
        .head
      val (sumSq, maxCell) = (sq.getLong(0), sq.getLong(1))
      assert(sumSq <= n * 4 * tgt,
        s"quadratic cells: sum sq $sumSq > ${n * 4 * tgt}")
      println(f"[probe-scale-eval]   cells: max $maxCell, " +
        f"sum-sq/n = ${sumSq.toDouble / n}%.0f (bound ${4 * tgt})")
    }

    // ── 5. PQ/ADC: the query-set regime is linear in |Q| ─────────────
    // 40 K corpus vectors (16 dims, m=4, k=16) built from 4 PROTOTYPE
    // subvectors per subspace, combo chosen by seed = id div 2 (so
    // every vector has an exact twin and only 256 distinct vectors
    // exist). Every corpus subvector then equals a codebook entry
    // verbatim — PROVIDED the md5 codebook sample covers all 4
    // prototypes per subspace, which the probe asserts explicitly —
    // so encoding error is 0, ADC distance equals true prototype
    // distance, and the planted truth is rank-1 adc_dist = 0 for
    // EVERY query (its twin shares all codes). Timing across
    // |Q| = 32 → 512 exposes the Θ(N·m·|Q|) scan the adcTopK
    // scaladoc's cutover guidance is about: linear growth in |Q|, no
    // sublinearity — past a few thousand queries, generate
    // candidates with the IVF-pruned path and keep ADC as the
    // reranker.
    val pqN = 40000L
    def proto(seed: Column, m: Int): Column =
      pmod(floor(seed / math.pow(4, m)).cast("long"), lit(4L))
    val pqVec = array((0 until 16).map { j =>
      val (m, jj) = (j / 4, j % 4)
      pmod(proto(col("_seed"), m) * 31L + lit(m * 17 + jj * 7),
        lit(2001L)) - 1000L
    }: _*)
    val pqLat = spark.range(pqN)
      .select(col("id").as("vec_id"),
        floor(col("id") / 2).cast("long").as("_seed"))
      .select(col("vec_id"), pqVec.as("v3"))
      .localCheckpoint()
    val cbRows = graft.operators.ProductQuantization
      .mdRanked(pqLat, "vec_id", 16, "pqprobe_cb")
      .select(floor(col("vec_id") / 2).cast("long").as("_seed"))
      .collect().map(_.getLong(0))
    for (m <- 0 until 4) {
      val covered = cbRows.map(s => (s / math.pow(4, m).toLong) % 4).toSet
      assert(covered == Set(0L, 1L, 2L, 3L),
        s"codebook sample misses subspace-$m prototypes: $covered " +
          "(pick a different cbSalt)")
    }
    for (nq <- Seq(32, 128, 512, 2048)) {
      val top = t(s"PQ/ADC 40K corpus, |Q|=$nq, top-5") {
        // the 2048 leg deliberately measures the wall PAST the
        // default maxAdcQueries guard (this probe is where the 1024
        // default came from) — raise the cap explicitly, which is
        // exactly the documented escape hatch
        graft.operators.ProductQuantization.adcTopK(
          pqLat, "vec_id", dims = 16, m = 4, k = 16,
          nQueries = nq, topK = 5, cbSalt = "pqprobe_cb",
          qSalt = "pqprobe_q", maxAdcQueries = 4096).localCheckpoint()
      }
      val r1 = top.filter(col("rank") === 1)
      val bad = r1.filter(col("adc_dist") =!= 0L).count()
      val nq1 = r1.count()
      assert(nq1 == nq && bad == 0L,
        s"|Q|=$nq: $nq1 rank-1 rows, $bad with nonzero ADC distance " +
          "(zero-quantization-error corpus: rank-1 must be a twin " +
          "or another dist-0 combo)")
    }

    // ── 6. the composed IVF→ADC cutover at the wall §5 just hit ───────
    // same corpus and query set at |Q| = 2048, candidates pruned to
    // nprobe/nlist = 1/16 of the corpus per query. The planted twin
    // shares its query's coarse cell by construction (identical
    // vector, identical argmin + tie rule), and the query's rank-1
    // probe IS its own assignment cell — so pruning cannot lose the
    // planted rank-1 truth, and the wall that forced the flat scan
    // into partial-aggregate spill divides by nlist/nprobe.
    val ivfTop = t("IVF->ADC 40K corpus, |Q|=2048, nlist=64, nprobe=4, top-5") {
      graft.operators.ProductQuantization.ivfAdcTopK(
        pqLat, "vec_id", dims = 16, m = 4, k = 16,
        nQueries = 2048, topK = 5, nlist = 64, nprobe = 4,
        cbSalt = "pqprobe_cb", qSalt = "pqprobe_q",
        ivfSalt = "pqprobe_ivf").localCheckpoint()
    }
    val ir1 = ivfTop.filter(col("rank") === 1)
    val ibad = ir1.filter(col("adc_dist") =!= 0L).count()
    val inq = ir1.count()
    assert(inq == 2048L && ibad == 0L,
      s"IVF->ADC |Q|=2048: $inq rank-1 rows, $ibad with nonzero ADC " +
        "distance — pruning lost the planted twins")

    // ── 7. residual IVFADC at the same wall (r13: IVFADC proper) ──────
    // same 40 K corpus and |Q| = 2048 as §6 — the residual pipeline
    // must hold the SAME Θ(candidates·m) wall (its only additions are
    // the broadcast centroid join for the corpus residuals and the
    // per-probed-cell tables, |Q|·nprobe·m·k rows). Planted truth,
    // exact by construction: every query's twin shares its coarse
    // cell (identical vector → identical argmin + tie rule) AND its
    // residual, so the twin's ADC distance is the minimum possible
    // over the codebook — Σ_m min_k ‖qres_m − c_k‖² — and no
    // candidate can sit below that floor: rank-1 adc_dist must EQUAL
    // the independently recomputed floor for all 2048 queries.
    val resTop = t("residual IVFADC 40K corpus, |Q|=2048, nlist=64, nprobe=4, top-5") {
      graft.operators.ProductQuantization.ivfAdcResidualTopK(
        pqLat, "vec_id", dims = 16, m = 4, k = 16,
        nQueries = 2048, topK = 5, nlist = 64, nprobe = 4,
        cbSalt = "pqprobe_cb", qSalt = "pqprobe_q",
        ivfSalt = "pqprobe_ivf").localCheckpoint()
    }
    // independent floor replay from the operator's public pieces.
    // The exact sandwich: per probed cell, the query residual's
    // min-code sum Σ_m min_k ‖qres(cell)_m − c_k‖² lower-bounds every
    // candidate scored IN that cell, so rank-1 ≥ the min of the four
    // per-cell floors; and the twin (same cell, same residual as the
    // query) ACHIEVES the own-cell floor, so rank-1 ≤ floor(own cell).
    // Both bounds are exact integers — no epsilon.
    def sq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val coarse = graft.operators.ProductQuantization
      .mdRanked(pqLat, "vec_id", 64, "pqprobe_ivf")
      .select(col("rank0").cast("int").as("_cell"), col("v3").as("_cv3"))
      .localCheckpoint()
    val asg = pqLat.crossJoin(broadcast(coarse))
      .withColumn("_d", sq(col("v3"), col("_cv3")))
      .withColumn("_rn", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy(col("vec_id"))
        .orderBy(col("_d").asc, col("_cell").asc)))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("_cell"), col("_cv3"))
    val resAll = asg.join(pqLat, Seq("vec_id"))
      .select(col("vec_id"),
        zip_with(col("v3"), col("_cv3"), (a, b) => a - b).as("v3"))
      .localCheckpoint()
    val cbRes = graft.operators.ProductQuantization.subspaces(
      graft.operators.ProductQuantization
        .mdRanked(resAll, "vec_id", 16, "pqprobe_cb")
        .select(col("rank0").as("code"), col("v3")),
      4, 4, out = "c3")
    // per-(query, probed cell) residuals: the same nprobe=4 window
    // rule as the operator, own cell = probe rank 1
    val qFrame = graft.operators.ProductQuantization
      .mdRanked(pqLat, "vec_id", 2048, "pqprobe_q")
      .select(col("vec_id").as("q_id"), col("v3").as("qv3"))
    val qProbes = qFrame.crossJoin(broadcast(coarse))
      .withColumn("_d", sq(col("qv3"), col("_cv3")))
      .withColumn("_pr", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy(col("q_id"))
        .orderBy(col("_d").asc, col("_cell").asc)))
      .filter(col("_pr") <= 4)
      .select(col("q_id"), col("_pr"),
        zip_with(col("qv3"), col("_cv3"), (a, b) => a - b).as("v3"))
    val cellFloors = graft.operators.ProductQuantization
      .subspaces(qProbes, 4, 4, out = "qsub")
      .join(broadcast(cbRes), Seq("m"))
      .withColumn("_td", sq(col("qsub"), col("c3")))
      .groupBy(col("q_id"), col("_pr"), col("m"))
      .agg(min(col("_td")).as("_mn"))
      .groupBy(col("q_id"), col("_pr")).agg(sum(col("_mn")).as("_f"))
    val floorFrame = cellFloors.groupBy(col("q_id")).agg(
      min(col("_f")).as("_floor_min"),
      min(when(col("_pr") === 1, col("_f"))).as("_floor_own"))
    val r1j = resTop.filter(col("rank") === 1)
      .join(floorFrame, Seq("q_id")).localCheckpoint()
    val offFloor = r1j.filter(col("adc_dist") > col("_floor_own") ||
      col("adc_dist") < col("_floor_min")).count()
    val rnq = r1j.count()
    assert(rnq == 2048L && offFloor == 0L,
      s"residual IVFADC: $rnq rank-1 rows, $offFloor outside the " +
        "exact [min-cell floor, own-cell floor] sandwich — the twin " +
        "achieves the own-cell floor and no scored candidate can " +
        "undercut its cell's floor")

    println("[probe-scale-eval] all planted truths exact")
    spark.stop()
  }
}
