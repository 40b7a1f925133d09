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
  * Scale shape: the per-round data motion is ONE pass over the cached
  * edge list. The (node, R) frame is first reduced to per-source
  * contributions `C(u)` by a tiny rank⋈outdeg join, and that frame —
  * one row per node with out-edges, never the edges — is what moves:
  * broadcast to the edge scan when the node set fits an executor
  * (`broadcastThreshold`), else shuffle-hash-joined against the
  * src-partitioned cached edges (no per-round sort, no edge
  * re-exchange). Partial aggregation map-side-combines the edge-side
  * contributions before the one small per-round shuffle on dst.
  * `localCheckpoint` severs lineage every other round so the plan
  * stays O(1) deep over any iteration count (the CC recipe). Edges
  * and degrees are computed once and persisted across rounds; all
  * caches except the final O(nodes) result are released on return.
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
    * @param everyNodeHasInEdge set when no node is source-only (always
    *              true for undirected graphs) — every node then
    *              receives contributions each round, so the per-round
    *              rebase join against the node set (which exists to
    *              hand isolated-in-degree nodes their base rank) is
    *              skipped entirely: one join and one broadcast fewer
    *              per round
    * @param broadcastThreshold node-count ceiling for the broadcast
    *              regime; above it the rank frame is shuffle-hash
    *              joined against src-partitioned edges instead
    *              (billion-node graphs can't broadcast their rank
    *              vector, but they can still avoid re-sorting edges)
    * @return (node, micro_rank) — micro_rank/10⁶ ≈ N·rank after
    *         `iterations` rounds.
    */
  def microPageRank(
      edges: DataFrame,
      iterations: Int,
      distinctEdges: Boolean = false,
      everyNodeHasOutEdge: Boolean = false,
      everyNodeHasInEdge: Boolean = false,
      broadcastThreshold: Long = 4000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e0 = edges.select(col("src"), col("dst"))
    val eRaw = (if (distinctEdges) e0 else e0.distinct()).persist()
    val outd = eRaw.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("outdeg"))
      .withColumnRenamed("src", "node").persist()
    val nodes = (if (everyNodeHasOutEdge) outd.select(col("node"))
      else eRaw.select(col("src").as("node"))
        .union(eRaw.select(col("dst").as("node"))).distinct()).persist()
    // regime pick: one O(nodes) count decides whether the per-round
    // rank frame is broadcast or shuffle-hash joined
    val bcast = nodes.count() <= broadcastThreshold
    // in the shuffle regime, pre-partition edges by src once so every
    // round's join reuses the cached exchange; in the broadcast regime
    // the edge partitioning is irrelevant — skip the extra shuffle
    val e = if (bcast) eRaw
      else { val p = eRaw.repartition(col("src")).persist()
             p.count(); eRaw.unpersist(); p }
    var rank = nodes.withColumn("r", lit(1000000L)).localCheckpoint(true)
    var pinned = rank
    for (i <- 1 to iterations) {
      // C(u) = R(u) div outdeg(u): one tiny node-keyed join BEFORE the
      // edges are touched — the edge-side join sees one narrow frame
      val contribPerSrc = rank.join(outd, Seq("node"))
        .select(col("node").as("src"), expr("r div outdeg").as("c"))
      val rankSide =
        if (bcast) broadcast(contribPerSrc)
        else contribPerSrc.hint("shuffle_hash")
      val contribs = e.join(rankSide, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .withColumnRenamed("dst", "node")
      val next = (if (everyNodeHasInEdge) contribs
        else nodes.join(
          if (bcast) broadcast(contribs) else contribs, Seq("node"), "left"))
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(sc, 0L)) div 100")).as("r"))
      // checkpoint every 4th round: a 4-round-deep lazy plan costs
      // little extra to optimize (each round is 3 joins + 1 agg), and
      // quartering the eager materialization barriers cuts the fixed
      // per-job cost that dominates small-graph runs
      if (i % 4 == 0 || i == iterations) {
        rank = next.localCheckpoint(true)
        pinned.unpersist()
        pinned = rank
      } else rank = next
    }
    Seq(e, outd, nodes).foreach(_.unpersist())
    rank.select(col("node"), col("r").as("micro_rank"))
  }
}
