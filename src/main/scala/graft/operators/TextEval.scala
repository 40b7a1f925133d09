package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-based text evaluation metrics (summarization / generation
  * eval): ROUGE-style clipped n-gram overlap between candidate and
  * reference documents.
  */
object TextEval {

  /** ROUGE-N precision / recall / F1 for (candidate, reference) pairs
    * with CLIPPED counts — each gram's contribution is
    * `min(count_cand(g), count_ref(g))`, the standard clipping that
    * stops a candidate from farming credit by repeating one
    * reference word.
    *
    * @param pairs (idC, idR) — one row per pair to score
    * @param grams (docId, gram) — one row per gram OCCURRENCE
    *              (duplicates carry the multiset counts)
    *
    * Zero-overlap pairs still score (P = R = F1 = 0), as do empty
    * sides (a 0-gram side scores 0, not null). All counts are exact
    * integers; each metric is one IEEE division (F1 composes the
    * unrounded P and R), rounded to 6 places at the output edge only.
    *
    * Scale shape: the multiset counts are a (docId, gram) aggregate;
    * the overlap join shuffles by the gram hash only for docs that
    * appear in `pairs` (semi-joined first), and the per-pair argsum is
    * map-side combinable. No windows, no driver state.
    */
  def rougeClipped(
      pairs: DataFrame,
      grams: DataFrame,
      idC: String = "id_c",
      idR: String = "id_r",
      docIdCol: String = "doc_id",
      gramCol: String = "gram"): DataFrame = {
    val p = pairs.select(col(idC), col(idR))
    val counts = grams
      .groupBy(col(docIdCol), col(gramCol))
      .agg(count(lit(1)).as("_cnt"))
    val totals = counts.groupBy(col(docIdCol))
      .agg(sum(col("_cnt")).as("_n"))

    // score only docs that participate in pairs
    val cIds = p.select(col(idC).as(docIdCol))
    val rIds = p.select(col(idR).as(docIdCol))
    val cCounts = counts.join(cIds.distinct(), Seq(docIdCol), "left_semi")
      .select(col(docIdCol).as(idC), col(gramCol), col("_cnt").as("_cc"))
    val rCounts = counts.join(rIds.distinct(), Seq(docIdCol), "left_semi")
      .select(col(docIdCol).as(idR), col(gramCol), col("_cnt").as("_rc"))

    val overlap = p
      .join(cCounts, Seq(idC))
      .join(rCounts, Seq(idR, gramCol))
      .groupBy(col(idC), col(idR))
      .agg(sum(least(col("_cc"), col("_rc"))).as("overlap"))

    val nC = totals.select(col(docIdCol).as(idC), col("_n").as("n_c"))
    val nR = totals.select(col(docIdCol).as(idR), col("_n").as("n_r"))
    val base = p
      .join(nC, Seq(idC), "left").join(nR, Seq(idR), "left")
      .join(overlap, Seq(idC, idR), "left")
      .select(col(idC), col(idR),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("n_c"), lit(0L)).as("n_c"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))

    val prec = when(col("n_c") === 0L, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("n_c"))
    val rec = when(col("n_r") === 0L, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("n_r"))
    val f1 = when(col("overlap") === 0L, lit(0.0))
      .otherwise(lit(2.0) * prec * rec / (prec + rec))
    base
      .withColumn("p", round(prec, 6))
      .withColumn("r", round(rec, 6))
      .withColumn("f1", round(f1, 6))
  }
}
