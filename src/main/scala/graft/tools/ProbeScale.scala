package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{LabelPropagation, PageRank, SkewTools}

/** Scale-regime probe (VERDICT r6 #7): measures — instead of arguing —
  * the design points the iterative/skew operators only exercise above
  * testdata scale:
  *
  *   1. PageRank at 6 M nodes / ~24 M edges: the node set exceeds
  *      `broadcastThreshold` (4 M), so the SHUFFLE-HASH regime engages
  *      on a graph 40× sf0.1. A second run forces the broadcast
  *      regime on the same graph to price the threshold's two sides.
  *   2. Label propagation on a 3 M-node undirected version.
  *   3. A deliberately skewed join (50% of a 10 M-row fact on ONE hot
  *      key): plain sort-merge (AQE skew off), AQE skew-join, and the
  *      explicit saltedBroadcastJoin at salt=32.
  *
  * Synthetic inputs by deterministic hash — generated in-cluster, no
  * testdata writes, nothing driver-side. Results are recorded in
  * BASELINE.md. Iteration aid; not part of the declared surface.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale")
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
      println(f"[probe-scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ── 1. PageRank regimes at 6 M nodes ───────────────────────────────
    val nNodes = 6000000L
    val nEdges = 24000000L
    def graph = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("dst"))
      .filter(col("src") =!= col("dst"))

    val shRows = t("pagerank 8r shuffle-hash (6M nodes, 24M edges)") {
      PageRank.microPageRank(graph, 8).count()
    }
    val bcRows = t("pagerank 8r forced-broadcast (same graph)") {
      PageRank.microPageRank(graph, 8, broadcastThreshold = 100000000L).count()
    }
    println(s"[probe-scale] pagerank rows: shuffle-hash=$shRows broadcast=$bcRows")

    // PPR on the same graph (r12: shares contribStep's zero-shuffle
    // broadcast rounds + the co-partitioned rebase; the seeded base
    // join is the extra per-round piece worth probing at 40×)
    val seeds = spark.range(100).select(col("id").as("node"))
    val pprRows = t("ppr 6r shuffle-hash (same graph, 100 seeds)") {
      PageRank.microPersonalizedPageRank(graph, seeds, 6).count()
    }
    val pprBc = t("ppr 6r forced-broadcast (same graph)") {
      PageRank.microPersonalizedPageRank(graph, seeds, 6,
        broadcastThreshold = 100000000L).count()
    }
    println(s"[probe-scale] ppr rows: shuffle-hash=$pprRows broadcast=$pprBc")

    // ── 2. LPA at 3 M nodes (undirected) ───────────────────────────────
    val lnN = 3000000L
    val half = spark.range(9000000L).select(
      pmod(xxhash64(col("id"), lit(3)), lit(lnN)).as("src"),
      pmod(xxhash64(col("id"), lit(4)), lit(lnN)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    val lpaRows = t("label-propagation 4r (3M nodes, 18M directed edges)") {
      LabelPropagation.propagate(und, 4).count()
    }
    println(s"[probe-scale] lpa rows: $lpaRows")

    // ── 3. Skewed join: plain vs AQE-skew vs salted ────────────────────
    val nFact = 10000000L
    val nDim = 100000L
    def fact = spark.range(nFact).select(
      when(pmod(col("id"), lit(2)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(5)), lit(nDim))).as("k"),
      col("id").as("v"))
    val dim = spark.range(nDim).select(col("id").as("k"),
      (col("id") * 7L).as("w"))

    def withConfs(confs: (String, String)*)(body: => Long): Long = {
      val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val plain = t("skew join: plain sort-merge (AQE skew off, no bcast)") {
      withConfs(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        fact.join(dim, Seq("k")).agg(sum(col("v") + col("w"))).count()
      }
    }
    val aqe = t("skew join: AQE skew-join (no bcast)") {
      withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        fact.join(dim, Seq("k")).agg(sum(col("v") + col("w"))).count()
      }
    }
    val salted = t("skew join: saltedBroadcastJoin salt=32") {
      SkewTools.saltedBroadcastJoin(fact, dim, "k", 32)
        .agg(sum(col("v") + col("w"))).count()
    }
    println(s"[probe-scale] join agg rows: plain=$plain aqe=$aqe salted=$salted")
    spark.stop()
  }
}
