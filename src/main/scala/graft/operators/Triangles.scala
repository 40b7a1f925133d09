package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting over an undirected edge list — the
  * local-clustering diagnostic for near-duplicate graphs (a transitive
  * near-dup relation forms triangles; a low clustering coefficient on
  * a candidate-pair graph means the pair generator is emitting
  * non-transitive noise).
  *
  * Scale shape — degree-ordered orientation (the classic distributed
  * triangle recipe): every undirected edge is directed from its
  * lower-(degree, id) endpoint to the higher one. Each node's oriented
  * out-degree is then O(sqrt(|E|)) on any graph, so the wedge join
  * (oriented ⋈ oriented on the shared LOW endpoint) — the only
  * superlinear step — produces Σ outdeg² = O(|E|^1.5) wedge rows
  * instead of the Σ deg² blow-up a hub node causes in the naive form
  * (a degree-d hub contributes d² wedges unoriented, but its edges
  * orient AWAY from it into many small out-sets when d is large).
  * Both joins are plain equi-joins: hash-shuffled, partial-aggregated,
  * AQE-skew-splittable — no driver state, no adjacency materialized.
  */
object Triangles {

  /** @param edges undirected pairs (a, b); self-loops dropped; either
    *              or both directions may be present — pairs are
    *              canonicalized and deduped internally.
    * @return (node, degree, n_triangles) — one row per node with at
    *         least one edge; n_triangles counts triangles CONTAINING
    *         the node.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient each edge low→high by (degree, id); the degree frame is
    // one row per node — usually broadcastable, but on a billion-node
    // graph it is not, so the planner (AQE) picks the join strategy
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("lo"), col("b").as("hi")))
        .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges: two oriented edges out of the same low node; closure:
    // the third edge may be oriented either way, so probe the
    // canonical (min, max) form against the canonical edge set
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      // the join predicate already orders the pair: e1.hi < e2.hi
      .select(col("e1.lo").as("x"),
        col("e1.hi").as("a"), col("e2.hi").as("b"))
    val triangles = wedges.join(canon, Seq("a", "b"))
    // each triangle (x, a, b) contains all three nodes
    val corners = triangles.select(col("x").as("node"))
      .union(triangles.select(col("a").as("node")))
      .union(triangles.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
