package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * data-prep stage that turns a graph into training SEQUENCES (walks
  * feed a skip-gram embedding model exactly like sentences do). The
  * "random" draws are the repo's portable md5 convention rather than
  * RNG state: walker (seed, r) at step t moves to neighbor
  * `conv(substr(md5(salt:seed:r:t), 1, 6), 16, 10) mod deg(cur)` in
  * the current node's SORTED DISTINCT neighbor list — a pure function
  * of (walk identity, step), so runs are reproducible under any
  * partitioning/retry and the full walk corpus hash-checks against an
  * unrolled SQL oracle.
  *
  * Scale shape: the adjacency table (node → sorted neighbor list) is
  * built once with one groupBy; each step is one equi-join of the
  * walker frontier against it — `steps` joins total, frontier rows =
  * #walks, never the edge list. Dead-end nodes (no out-edges) end
  * their walk early (inner join drops the walker).
  */
object RandomWalks {

  /** (walk_id, step 0..steps, node). walk_id = "<seed>_<r>". */
  def walks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      walksPerSeed: Int = 3,
      steps: Int = 4,
      salt: String = "walk_v1"): DataFrame = {
    require(walksPerSeed >= 1 && steps >= 1, "need walks and steps >= 1")
    val adj = edges
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .groupBy(col("_s"))
      .agg(sort_array(collect_set(col("_d"))).as("_nbrs"))
      .withColumn("_deg", size(col("_nbrs")).cast("long"))
    var frontier = seeds.select(col(seedCol).as("_seed")).distinct()
      .withColumn("_r", explode(sequence(lit(0), lit(walksPerSeed - 1))))
      .withColumn("walk_id", concat(col("_seed").cast("string"), lit("_"),
        col("_r").cast("string")))
      .withColumn("_cur", col("_seed"))
    var out = frontier.select(col("walk_id"), lit(0).as("step"),
      col("_cur").as("node"))
    for (t <- 1 to steps) {
      val draw = pmod(
        conv(substring(md5(concat(lit(salt + ":"),
          col("_seed").cast("string"), lit(":"),
          col("_r").cast("string"), lit(s":$t"))), 1, 6), 16, 10)
          .cast("long"),
        col("_deg"))
      frontier = frontier.join(adj, frontier("_cur") === adj("_s"))
        .withColumn("_next", element_at(col("_nbrs"), (draw + 1).cast("int")))
        .select(col("walk_id"), col("_seed"), col("_r"),
          col("_next").as("_cur"))
      out = out.unionByName(frontier.select(col("walk_id"),
        lit(t).as("step"), col("_cur").as("node")))
    }
    out
  }
}
