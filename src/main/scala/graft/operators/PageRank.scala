package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the canonical
  * iterative-graph workload (centrality scoring of a dedup/citation/
  * link graph in a data-curation pipeline), expressed as pure
  * DataFrame rounds like the connected-components operator.
  *
  * Arithmetic is FIXED-POINT: ranks are integer micro-units
  * (R = N·rank·10⁶ scaled so R₀ = 10⁶ per node) and every step is
  * long arithmetic —
  *
  *   C(u)  = R(u) div outdeg(u)
  *   R'(v) = 150000 + (85 · Σ_{u→v} C(u)) div 100
  *
  * Float formulations of this recurrence are a cross-engine trap that
  * this operator exists to avoid: damping multiplies keep producing
  * EXACT decimal intermediates, which land on genuine decimal-
  * rounding ties ~10⁻³ of the time, and engines then disagree on the
  * tie (an exact-decimal engine tie-breaks the true value, a binary
  * engine rounds the nearest double's off-tie representation —
  * observed as 1e-6 drift against DuckDB at sf0.01 for BOTH a
  * ROUND-based and a cast-based float variant). Integer div has no
  * ties and no representation gap: any engine reproduces the result
  * bit-exactly, under any partitioning or aggregation order (sums of
  * longs are exact). The floor in `div` leaks ≤1 micro-unit per edge
  * per round — ~10⁻⁶ relative, the price of determinism.
  *
  * Scale shape: each round is one equi-join of edges against the
  * (node, R) frame on the edge source plus one aggregate on the edge
  * target — both shuffle on node keys, nothing is ever collected, and
  * `localCheckpoint` severs lineage so the plan stays O(1) deep over
  * any iteration count (the CC recipe). Edges and degrees are
  * computed once and persisted across rounds.
  */
object PageRank {

  /** @param edges directed (src, dst) pairs; feed both directions for
    *              an undirected graph.
    * @param distinctEdges set when the input is already pair-distinct —
    *              skips a full-width dedup shuffle of the edge list
    *              (the setup, not the rounds, dominates this operator)
    * @param everyNodeHasOutEdge set when no node is sink-only (always
    *              true for undirected graphs) — derives the node set
    *              from the out-degree frame instead of a
    *              union-distinct over both edge endpoints
    * @return (node, micro_rank) — micro_rank/10⁶ ≈ N·rank after
    *         `iterations` rounds.
    */
  def microPageRank(
      edges: DataFrame,
      iterations: Int,
      distinctEdges: Boolean = false,
      everyNodeHasOutEdge: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // partition edges by src ONCE: the cached partitioning is reused by
    // every round's source-side join AND the out-degree aggregate, so
    // only the tiny (node, r) frame moves per round
    val e0 = edges.select(col("src"), col("dst"))
    val e = (if (distinctEdges) e0 else e0.distinct())
      .repartition(col("src")).persist()
    val outd = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("outdeg")).persist()
    val nodes = (if (everyNodeHasOutEdge) outd.select(col("src").as("node"))
      else e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()).persist()
    var rank = nodes.withColumn("r", lit(1000000L)).localCheckpoint(true)
    var pinned = rank
    for (i <- 1 to iterations) {
      val contribs = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outd, Seq("src"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sc"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(sc, 0L)) div 100")).as("r"))
      // checkpoint every other round: a 2-round-deep lazy plan costs
      // nothing extra to optimize, and halving the eager materialization
      // barriers nearly halves the per-round fixed job cost
      if (i % 2 == 0 || i == iterations) {
        rank = next.localCheckpoint(true)
        pinned.unpersist()
        pinned = rank
      } else rank = next
    }
    Seq(e, outd, nodes).foreach(_.unpersist())
    rank.select(col("node"), col("r").as("micro_rank"))
  }
}
