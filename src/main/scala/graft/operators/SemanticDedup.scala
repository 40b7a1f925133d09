package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): partition the embedding space into cells with a
  * coarse quantizer, then mark, WITHIN each cell only, every vector
  * whose cosine to a lower-id cell member reaches the threshold as a
  * duplicate of the smallest such member. Cross-cell near-duplicates
  * are missed by design — that locality is what makes the pairwise
  * step tractable: the quadratic is bounded per cell (Σ|cell|² ≪ n²),
  * and at 100 TB each cell's members co-locate on one shuffle
  * partition, so no vector ever meets a vector from another cell.
  *
  * The quantizer is the PORTABLE md5-rank draw
  * ([[Similarity.ivfTopKPortable]]'s recipe): centroids are the
  * `nlist` corpus vectors ranked first by `(md5(id ":" salt), id)`;
  * cell assignment accumulates squared-L2 in array index order with
  * ties to the lower cell — so every decision, including which pairs
  * are never compared, is bit-reproducible in SQL and the WHOLE
  * operator is hash-checkable (the same argument as q32's pruned IVF).
  *
  * Output: one row per input vector —
  * `(idCol, cell, dup_of, max_dup_cos, keep)` where `dup_of` is the
  * smallest lower id in the same cell with cosine ≥ threshold (null
  * when none), `max_dup_cos` the largest qualifying cosine (6 dp),
  * and `keep = dup_of IS NULL` — the SemDeDup survivor set.
  */
object SemanticDedup {

  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      threshold: Double = 0.4,
      salt: String = "semdedup_v1"): DataFrame = {
    // bounded collect: exactly nlist centroid rows (the portable draw)
    val centroids: Array[Array[Double]] = df
      .select(col(idCol).as("_id"),
        VectorFunctions.toDouble(col(vecCol)).as("_v"))
      .orderBy(md5(concat(col("_id").cast("string"), lit(":" + salt))),
        col("_id"))
      .limit(nlist)
      .select("_v").collect()
      .map(_.getSeq[Double](0).toArray)

    // one compiled pass assigns each vector to its cell
    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell",
        graft.functions.expressions.TextExpressions.nearest_centroid(
          col(vecCol), centroids.map(_.toSeq).toSeq))

    // within-cell pairwise: only (cell, id, vec) rows shuffle, keyed by
    // cell — members of different cells never meet
    val a = assigned.select(col("cell"), col(idCol).as("_id_a"),
      col(vecCol).as("_v_a"))
    val b = assigned.select(col("cell"), col(idCol).as("_id_b"),
      col(vecCol).as("_v_b"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("_id_b") < col("_id_a"))
      .withColumn("_cos", VectorFunctions.cosine(col("_v_a"), col("_v_b")))
      .filter(col("_cos") >= threshold)
      .groupBy(col("_id_a"))
      .agg(min(col("_id_b")).as("dup_of"),
        round(max(col("_cos")), 6).as("max_dup_cos"))

    assigned
      .join(dups, assigned(idCol) === dups("_id_a"), "left")
      .select(col(idCol), col("cell"), col("dup_of"), col("max_dup_cos"),
        col("dup_of").isNull.as("keep"))
  }
}
