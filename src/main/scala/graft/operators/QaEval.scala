package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQuAD-style answer scoring — exact match and token-level F1 over
  * (prediction, gold) pairs: the benchmark readout an eval harness
  * runs after batch inference, and (with the usual threshold) the
  * decontamination cross-check for QA eval sets.
  *
  * Normalization is the published SQuAD recipe, pinned: lowercase,
  * strip every non-alphanumeric to a space, drop the articles
  * a/an/the, collapse whitespace. Token F1 uses CLIPPED multiset
  * overlap (the q-gram convention): F1 = 2·ov / (|p| + |g|) — ONE
  * division of exact integers, like P and R, so every reported
  * double hash-checks with no rounding step. Empty-vs-empty scores
  * 1.0 (the no-answer convention), empty-vs-nonempty 0.0.
  *
  * Pure per-row array algebra (answers are sentence-length — the
  * per-distinct-token count scan is bounded); zero shuffle, fuses
  * into the feeding scan (q294).
  */
object QaEval {

  /** SQuAD answer normalization → token array. */
  def normTokens(s: Column): Column = {
    val folded = regexp_replace(
      regexp_replace(lower(s), "[^a-z0-9]", " "),
      "\\b(a|an|the)\\b", " ")
    filter(split(folded, " "), t => length(t) > 0)
  }

  /** Clipped multiset overlap of two token arrays. */
  def clippedOverlap(p: Column, g: Column): Column =
    aggregate(
      array_distinct(p),
      lit(0),
      (acc, t) => acc + least(
        size(filter(p, x => x === t)),
        size(filter(g, x => x === t))))

  /** Per-pair scores: (idCol, n_pred_tokens, n_gold_tokens, overlap,
    * exact_match, precision, recall, f1).
    */
  def score(df: DataFrame, idCol: String, predCol: String,
      goldCol: String): DataFrame = {
    val staged = df.select(col(idCol),
      normTokens(col(predCol)).as("_p"),
      normTokens(col(goldCol)).as("_g"))
      .select(col(idCol), col("_p"), col("_g"),
        clippedOverlap(col("_p"), col("_g")).cast("long").as("overlap"),
        size(col("_p")).cast("long").as("n_pred_tokens"),
        size(col("_g")).cast("long").as("n_gold_tokens"))
    val bothEmpty = col("n_pred_tokens") === 0L && col("n_gold_tokens") === 0L
    val anyEmpty = col("n_pred_tokens") === 0L || col("n_gold_tokens") === 0L
    staged.select(col(idCol),
      col("n_pred_tokens"), col("n_gold_tokens"), col("overlap"),
      (bothEmpty || col("_p") === col("_g")).as("exact_match"),
      when(bothEmpty, 1.0).when(anyEmpty, 0.0)
        .otherwise(col("overlap").cast("double") /
          col("n_pred_tokens").cast("double")).as("precision"),
      when(bothEmpty, 1.0).when(anyEmpty, 0.0)
        .otherwise(col("overlap").cast("double") /
          col("n_gold_tokens").cast("double")).as("recall"),
      when(bothEmpty, 1.0).when(anyEmpty, 0.0)
        .otherwise(lit(2.0) * col("overlap").cast("double") /
          (col("n_pred_tokens") + col("n_gold_tokens")).cast("double"))
        .as("f1"))
  }
}
