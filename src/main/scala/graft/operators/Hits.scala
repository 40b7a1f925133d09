package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg 1999) over a directed edge list —
  * hubs point at good authorities, authorities are pointed at by good
  * hubs: the link-analysis complement to [[PageRank]] (which ranks by
  * stationary visitation, not by the hub/authority duality a curation
  * pipeline wants when ranking e.g. link aggregators vs content
  * hosts).
  *
  * Arithmetic is the [[PageRank]] integer fixed point: scores are
  * micro-units, each half-step is an exact long/DECIMAL sum, and the
  * round's L1 NORMALIZATION (the sum-normalized HITS variant — L2
  * would put a sqrt inside the loop; with a fixed round count the
  * rankings coincide) is the exact floor division
  * score' = (raw · N·10⁶) div Σraw. No IEEE anywhere, so any engine
  * replays it bit-exactly.
  *
  * Scale shape: per half-step ONE equi-join of the narrow score
  * frame against the cached distinct edge list and one
  * map-side-combinable aggregate; normalization totals ride 1-row
  * broadcasts. Score frames localCheckpoint every other round (the
  * CC/PageRank lineage recipe). Nodes missing a side (pure hubs /
  * pure authorities) surface with an exact 0, not null.
  */
object Hits {

  private val dec = "decimal(38,0)"

  private def normalize(raw: DataFrame, scaleRow: DataFrame,
      out: String): DataFrame = {
    val tot = raw.agg(sum(col("_raw").cast(dec)).as("_tot"))
    raw.crossJoin(broadcast(tot)).crossJoin(broadcast(scaleRow))
      .select(col("node"), {
        val x = col("_raw").cast(dec) * col("_scale")
        ((x - pmod(x, col("_tot"))) / col("_tot")).cast("long").as(out)
      })
  }

  /** @return (node, micro_hub, micro_auth) after `iterations` full
    *         hub+authority rounds; Σ of each side ≈ N·10⁶.
    */
  def microHits(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val scaleRow = nodes.agg(count(lit(1)).as("_n"))
      .select((col("_n").cast(dec) * lit(1000000L).cast(dec))
        .as("_scale")).localCheckpoint()

    var h = nodes.withColumn("micro_hub", lit(1000000L))
    var a: DataFrame = null
    for (i <- 1 to iterations) {
      val rawA = e
        .join(h.select(col("node").as("src"), col("micro_hub")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("micro_hub")).as("_raw"))
      a = normalize(rawA, scaleRow, "micro_auth")
      val rawH = e
        .join(a.select(col("node").as("dst"), col("micro_auth")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("micro_auth")).as("_raw"))
      h = normalize(rawH, scaleRow, "micro_hub")
      if (i % 2 == 0 && i < iterations) {
        h = h.localCheckpoint(); a = a.localCheckpoint()
      }
    }
    val out = nodes
      .join(h, Seq("node"), "left")
      .join(a, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("micro_hub"), lit(0L)).as("micro_hub"),
        coalesce(col("micro_auth"), lit(0L)).as("micro_auth"))
      .localCheckpoint()
    e.unpersist(); nodes.unpersist()
    out
  }
}
