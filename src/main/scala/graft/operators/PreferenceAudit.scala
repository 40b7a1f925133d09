package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Preference-pair (DPO/RLHF) dataset hygiene — the audit a reward-
  * model or DPO pipeline runs before training on (prompt, chosen,
  * rejected) triples, because the classic failure modes are all
  * STRUCTURAL and detectable without any model:
  *
  *  - LENGTH BIAS: if `chosen` is longer than `rejected` in most
  *    pairs, the model learns "longer = better", not preference.
  *  - TIES: identical chosen/rejected (dedup slips, labeling bugs)
  *    contribute gradient noise at best.
  *  - NEAR-TIES: high token overlap means the pair carries almost
  *    no preference signal per token.
  *
  * Per-source output so a curation pipeline can quota or re-balance
  * the offending sources. Exactness: token counts are the fleet's
  * whitespace arithmetic; the mean length delta is an exact integer
  * mean (Σ int64, one pinned divide); the mean overlap carries each
  * pair's 6-dp-rounded Jaccard on the 1e-6 integer lattice (the
  * lattice-ln convention applied to ratios), so the per-source
  * means are order-independent.
  *
  * Scale shape: one projection per pair (the Jaccard runs on the
  * pair's OWN two token arrays — array intersection per row, never
  * a join), one map-side-combined aggregate by source. No shuffles
  * beyond the final |sources|-row aggregate.
  */
object PreferenceAudit {

  def audit(df: DataFrame, sourceCol: String, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val cTok = TextFunctions.tokenCountArithmetic(col(chosenCol))
      .cast("long")
    val rTok = TextFunctions.tokenCountArithmetic(col(rejectedCol))
      .cast("long")
    val cSet = array_distinct(TextFunctions.tokens(lower(col(chosenCol))))
    val rSet = array_distinct(TextFunctions.tokens(lower(col(rejectedCol))))
    val nInter = size(array_intersect(cSet, rSet))
    val nUnion = size(array_union(cSet, rSet))
    val jac = when(nUnion === 0, 1.0) // two empty strings are a tie
      .otherwise(round(nInter.cast("double") / nUnion.cast("double"), 6))
    val jac6 = round(jac * 1000000.0, 0).cast("long")
    df.select(col(sourceCol),
        cTok.as("_ct"), rTok.as("_rt"),
        (col(chosenCol) === col(rejectedCol)).as("_tie"),
        jac6.as("_j6"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_ct") > col("_rt"), 1L).otherwise(0L))
          .as("n_chosen_longer"),
        sum(when(col("_tie"), 1L).otherwise(0L)).as("n_ties"),
        sum(col("_ct") - col("_rt")).as("_sumdelta"),
        sum(col("_j6")).as("_sumj6"))
      .select(col(sourceCol), col("n_pairs"),
        round(col("n_chosen_longer").cast("double")
          / col("n_pairs").cast("double"), 6).as("chosen_longer_frac"),
        round(col("n_ties").cast("double")
          / col("n_pairs").cast("double"), 6).as("tie_frac"),
        round(col("_sumdelta").cast("double")
          / col("n_pairs").cast("double"), 6).as("mean_len_delta"),
        round(col("_sumj6").cast("double") / 1000000.0
          / col("n_pairs").cast("double"), 6).as("mean_overlap"))
  }
}
