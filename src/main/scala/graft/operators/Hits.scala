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
  * Arithmetic is the [[PageRank]] integer discipline, with one
  * structural improvement over the textbook loop: the power
  * iteration runs UNNORMALIZED on DECIMAL(38,0) (per-round
  * normalization exists only to stop float overflow — exact decimals
  * don't need it, and a mid-loop total would force a materialization
  * barrier per half-step), and the L1 sum-normalization
  * score = (raw · N·10⁶) div Σraw happens ONCE at the end as an
  * exact floor division. No IEEE anywhere; any engine replays the
  * fixed point bit-exactly. Magnitude bound: values grow ≤ ×(Σdeg)
  * per half-step — 38 decimal digits hold ~4 rounds at
  * billion-edge scale (the declared round count; raise the scale
  * analysis before raising `iterations` past ~6 on dense graphs).
  *
  * Scale shape: per half-step ONE equi-join of the narrow score
  * frame against the cached distinct edge list and one
  * map-side-combinable aggregate — all rounds batch LAZILY into one
  * job (the PageRank recipe; localCheckpoint severs lineage every
  * other round), and only the two closing totals ride 1-row
  * broadcasts. Pure hubs / pure authorities surface with an exact 0.
  */
object Hits {

  private val dec = "decimal(38,0)"

  /** @return (node, micro_hub, micro_auth) after `iterations` full
    *         hub+authority rounds; Σ of each side ≈ N·10⁶.
    */
  def microHits(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 8,
      s"iterations out of the decimal-headroom envelope: $iterations")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val scaleRow = nodes.agg(count(lit(1)).as("_n"))
      .select((col("_n").cast(dec) * lit(1000000L).cast(dec))
        .as("_scale")).localCheckpoint()

    var h = nodes.select(col("node"),
      lit(1000000L).cast(dec).as("_v"))
    var a: DataFrame = null
    for (i <- 1 to iterations) {
      a = e.join(h.select(col("node").as("src"), col("_v")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("_v")).as("_v"))
      h = e.join(a.select(col("node").as("dst"), col("_v")), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("_v")).as("_v"))
      // deep chains only need severing every 4 rounds (8 lazy joins);
      // no frame in the loop is consumed twice, so there is no
      // recompute to pin against until the closing normalization
      if (i % 4 == 0 && i < iterations) {
        a = a.localCheckpoint(); h = h.localCheckpoint()
      }
    }
    // the totals AND the rescale consume each final frame — pin ONCE
    // so the whole 2·iterations-join chain executes exactly once
    a = a.localCheckpoint(); h = h.localCheckpoint()

    def normalize(f: DataFrame, out: String): DataFrame = {
      val tot = f.agg(sum(col("_v")).as("_tot"))
      f.crossJoin(broadcast(tot)).crossJoin(broadcast(scaleRow))
        .select(col("node"), {
          val x = col("_v") * col("_scale")
          ((x - pmod(x, col("_tot"))) / col("_tot")).cast("long").as(out)
        })
    }
    val out = nodes
      .join(normalize(h, "micro_hub"), Seq("node"), "left")
      .join(normalize(a, "micro_auth"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("micro_hub"), lit(0L)).as("micro_hub"),
        coalesce(col("micro_auth"), lit(0L)).as("micro_auth"))
      .localCheckpoint()
    e.unpersist(); nodes.unpersist()
    out
  }
}
