package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.5).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k; the *query* side is
  *    broadcast (queries ≪ corpus), so the corpus is scanned once with
  *    no shuffle of the big side — the correct baseline even at 100 TB
  *    when the query batch is small.
  *  - [[ivfTopK]]: IVF — KMeans coarse quantizer partitions the corpus
  *    by nearest centroid; a query probes only its `nprobe` closest
  *    cells. Corpus assignment is one pass + a bucket-keyed shuffle;
  *    search touches ~nprobe/nlist of the data.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) big table
    * @param queries (qidCol, qvecCol) small table — broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine_sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine_sim").desc, col(corpusId).asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(queryId), col(corpusId), round(col("cosine_sim"), 6).as("cosine_sim"),
        col("_rn").as("rank"))
  }

  /** IVF (inverted-file) ANN: coarse KMeans cells + nprobe search.
    * Returns the same schema as [[bruteForceTopK]]; recall < 1 by
    * construction (ANN), deterministic given the fixed seed.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession

    // 1. coarse quantizer fit (sampled if huge; full here)
    val withVec = corpus.withColumn("_v", array_to_vector(toDouble(col(corpusVec))))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("_v").setPredictionCol("_cell")
    val model = km.fit(withVec)
    val centroids = model.clusterCenters.map(_.toArray)

    // 2. corpus → cell assignment (one pass, stays partitioned by cell)
    val assigned = model.transform(withVec).drop("_v")

    // 3. queries probe their nprobe nearest centroids (tiny driver math
    //    re-expressed as a broadcast list join: cell distance via column
    //    algebra against centroid literals)
    val centroidRows = centroids.zipWithIndex.map { case (cArr, i) =>
      (i, cArr.toSeq)
    }
    import spark.implicits._
    val centroidDf = centroidRows.toSeq.toDF("_cell", "_centroid")
    val probed = queries.crossJoin(broadcast(centroidDf))
      .withColumn("_cdist", l2Dist2(col(queryVec), col("_centroid")))
    val wProbe = Window.partitionBy(col(queryId)).orderBy(col("_cdist").asc, col("_cell").asc)
    val queryCells = probed.withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select(col(queryId), col(queryVec), col("_cell"))

    // 4. candidate join on cell + exact cosine + top-k
    val scored = assigned.join(broadcast(queryCells), Seq("_cell"))
      .withColumn("cosine_sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine_sim").desc, col(corpusId).asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(queryId), col(corpusId), round(col("cosine_sim"), 6).as("cosine_sim"),
        col("_rn").as("rank"))
  }
}
