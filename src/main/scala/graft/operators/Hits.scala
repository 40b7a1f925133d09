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
  * score = (raw · N·10⁶) div Σraw happens at ONE mid-point and once
  * at the end, both exact floor divisions. No IEEE anywhere; any
  * engine replays the fixed point bit-exactly. Magnitude bound:
  * values grow ≤ ×(side mass) per half-step; the mid-point
  * renormalization (measured necessary by ProbeScaleEval — a
  * K_{2000,500} graph overflowed 38 digits by round 4 without it)
  * caps each unnormalized stretch at ⌈iterations/2⌉ rounds.
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
      // ONE exact mid-point renormalization bounds the decimal
      // magnitude: unnormalized growth is ×(side mass) per half-step
      // and K_{2000,500}-dense graphs overflow 38 digits by round 4
      // (found by ProbeScaleEval — the closing rescale's v·scale
      // product went null). Renormalizing once at ⌊iters/2⌋ caps the
      // remaining growth while keeping every other round lazy.
      if (iterations >= 3 && i == iterations / 2) {
        a = a.localCheckpoint(); h = h.localCheckpoint()
        a = normalize(a, "_m")
          .select(col("node"), col("_m").cast(dec).as("_v"))
        h = normalize(h, "_m")
          .select(col("node"), col("_m").cast(dec).as("_v"))
      }
    }
    // the totals AND the rescale consume each final frame — pin ONCE
    // so the whole chain executes exactly once
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
