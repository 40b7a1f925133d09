package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bfs, KCore, ShortestPaths}

/** Scale probe for the r7 traversal/peeling operators: BFS hop
  * distance, bounded Bellman-Ford and k-core at multi-million-node
  * scale — the shuffle-hash regime (2·|edges| ≫ broadcastThreshold)
  * the sf0.1 gate never enters. Beyond timing, the run checks the
  * cross-operator invariants that must hold if the delta-frontier
  * logic is right at scale:
  *
  *   - BFS and Bellman-Ford reach EXACTLY the same node set (same
  *     rounds bound, weights ≥ 1);
  *   - on every reached node, cost ≥ dist (a w≥1 path of h hops
  *     costs ≥ h) and cost ≤ 9·dist (max weight 9 on the hop-minimal
  *     path bounds the min cost);
  *   - every k-core survivor's induced degree is ≥ k (the fixed
  *     point was actually reached within the round budget).
  *
  * Synthetic hash graphs, generated in-cluster, no testdata writes.
  * Results recorded in BASELINE.md. Iteration aid; not part of the
  * declared surface.
  */
object ProbeScaleGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-graph")
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
      println(f"[probe-graph] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nNodes = 5000000L
    val nEdges = 20000000L
    def edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(11)), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id"), lit(12)), lit(nNodes)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val seeds = spark.range(100).select(col("id").as("node"))

    val dist = t("bfs 4 hops, 100 seeds (5M nodes, 20M edges, shuffle-hash)") {
      Bfs.hopDistance(edges, seeds, maxHops = 4).persist()
    }
    println(s"[probe-graph] bfs reached: ${dist.count()}")

    val wedges = edges.withColumn("w",
      (pmod(xxhash64(col("src"), col("dst")), lit(9)) + 1L))
    val cost = t("bellman-ford 4 rounds (same graph, w in 1..9)") {
      ShortestPaths.bounded(wedges, seeds, rounds = 4).persist()
    }
    println(s"[probe-graph] sp reached: ${cost.count()}")

    val joined = dist.join(cost, Seq("node"), "full_outer")
    val mismatched = joined.filter(
      col("dist").isNull || col("cost").isNull ||
      col("cost") < col("dist") || col("cost") > col("dist") * 9L).count()
    println(s"[probe-graph] invariant violations (reach/cost bounds): " +
      s"$mismatched (MUST be 0)")
    dist.unpersist(); cost.unpersist()

    // mean total degree ~5.6 — just above the ~5.1 emergence
    // threshold for a 4-core in a random graph, so the peel cascades
    // hard AND leaves a non-trivial fixed point
    val thinEdges = 14000000L
    def thin = spark.range(thinEdges).select(
      pmod(xxhash64(col("id"), lit(21)), lit(nNodes)).as("s"),
      pmod(xxhash64(col("id"), lit(22)), lit(nNodes)).as("d"))
      .filter(col("s") =!= col("d"))
    val und = thin.select(col("s").as("src"), col("d").as("dst"))
      .union(thin.select(col("d").as("src"), col("s").as("dst")))
    val rounds = sys.env.getOrElse("PROBE_KCORE_ROUNDS", "8").toInt
    val core = t(s"k-core k=4, $rounds rounds (5M nodes, 28M directed edges)") {
      KCore.coreMembers(und, k = 4, rounds = rounds).persist()
    }
    val n = core.count()
    val below = core.filter(col("core_degree") < 4).count()
    println(s"[probe-graph] 4-core survivors: $n; " +
      s"below-k degrees: $below (0 ⇔ fixed point reached)")
    core.unpersist()
    spark.stop()
  }
}
