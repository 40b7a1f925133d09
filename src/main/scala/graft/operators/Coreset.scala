package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Greedy k-center (farthest-point traversal) coreset selection —
  * the Gonzalez 2-approximation every diverse-subset pipeline uses to
  * pick representative examples for labeling/eval/training: seed with
  * the smallest id, then repeatedly add the point FARTHEST from the
  * current center set.
  *
  * Scale shape — this is the textbook way to run k-center on a
  * cluster: the state is one `(id, vec, mind2)` frame over the
  * corpus; each round updates `mind2 = least(mind2, d²(v, newCenter))`
  * with the 1-row center broadcast (no shuffle of the corpus), and the
  * argmax is a distributed TakeOrdered, not a global sort or a driver
  * scan. k rounds → k corpus passes, each embarrassingly parallel;
  * rounds are localCheckpoint'ed so lineage stays flat.
  *
  * Determinism: squared-L2 accumulates in array index order (the q32
  * recipe), the running min is an IEEE `least` chain in round order,
  * and the argmax breaks ties by (mind2 desc, id asc) — so the whole
  * greedy trajectory, center identities included, is replayable in
  * SQL and hash-checkable.
  *
  * Output: one row per selected center —
  * `(center_rank 1..k, idCol, sel_d2)` where `sel_d2` is the
  * 6-dp-rounded distance² that made the point the farthest at its
  * selection round (null for the rank-1 seed).
  */
object Coreset {

  def kCenterCoreset(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val seed = df.orderBy(col(idCol).asc).limit(1)
      .select(col(idCol).as("center_id"), col(vecCol).as("_cvec"))
      .localCheckpoint(true)
    var centers = seed
      .select(col("center_id"), lit(1).as("center_rank"),
        lit(null).cast("double").as("sel_d2"))
    var state = df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(seed.select(col("_cvec"))))
      .withColumn("_mind2",
        VectorFunctions.l2Dist2(col(vecCol), col("_cvec")))
      .drop("_cvec")
      .localCheckpoint(true)
    for (r <- 2 to k) {
      val pick = state
        .join(centers.select(col("center_id").as(idCol)), Seq(idCol),
          "left_anti")
        .orderBy(col("_mind2").desc, col(idCol).asc).limit(1)
        .select(col(idCol).as("center_id"), col(vecCol).as("_cvec"),
          col("_mind2").as("_seld2"))
        .localCheckpoint(true) // 1 row; consumed twice below
      centers = centers.unionByName(pick.select(col("center_id"),
        lit(r).as("center_rank"), round(col("_seld2"), 6).as("sel_d2")))
      if (r < k)
        state = state.crossJoin(broadcast(pick.select(col("_cvec"))))
          .withColumn("_mind2", least(col("_mind2"),
            VectorFunctions.l2Dist2(col(vecCol), col("_cvec"))))
          .drop("_cvec")
          .localCheckpoint(true)
    }
    centers.select(col("center_rank"), col("center_id").as(idCol),
      col("sel_d2"))
  }
}
