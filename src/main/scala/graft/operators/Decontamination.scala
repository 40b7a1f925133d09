package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation set — the standard pre-training hygiene
  * pass (an LLM corpus must not contain its own eval benchmarks).
  *
  * Semantics: a (train, eval) pair is reported when the two documents
  * share at least `minShared` DISTINCT word `n`-grams (whitespace
  * tokens, lowercased). Exact — no hashing, no sketching — so the
  * result is oracle-checkable; the scale story below explains why
  * exactness is also the right production choice here.
  *
  * Scale shape (the asymmetry IS the design): eval benchmarks are
  * tiny — a few MB of text against a 100 TB corpus. The eval side's
  * distinct n-grams therefore always fit in one executor, so the
  * plan BROADCASTS the eval grams and streams the corpus through a
  * broadcast hash join: ZERO shuffle of corpus-side grams, one pass
  * over the corpus, partial-aggregated pair counts as the only data
  * motion. Corpus-side grams are never materialized wider than one
  * scan task. A banded/sketched variant would save nothing (the big
  * side is already unshuffled) and cost false negatives.
  */
object Decontamination {

  /** Distinct word n-grams per document: (id, gram). */
  def wordNgrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = docs.select(col(idCol).as("id"),
      filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0).as("t"))
    toks.filter(size(col("t")) >= n)
      .select(col("id"), explode(
        transform(sequence(lit(1), size(col("t")) - (n - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(n))))).as("gram"))
      .distinct()
  }

  /** (train_id, eval_id, n_shared) for pairs sharing >= minShared
    * distinct n-grams. `eval` is broadcast — it is the benchmark set
    * and is small by construction.
    */
  def overlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minShared: Long): DataFrame = {
    val tg = wordNgrams(train, idCol, textCol, n)
      .withColumnRenamed("id", "train_id")
    val eg = wordNgrams(eval, idCol, textCol, n)
      .withColumnRenamed("id", "eval_id")
    // both sides are per-doc distinct, so count(*) counts distinct
    // shared grams; map-side partial agg combines before the one
    // small (train_id, eval_id) shuffle
    tg.join(broadcast(eg), "gram")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Embedding-space decontamination gate — the semantic complement
    * to [[overlap]]'s verbatim n-grams: flag corpus vectors whose
    * cosine to ANY benchmark vector reaches τ (paraphrased eval
    * leakage that no string match sees).
    *
    * The gate is EXACT integer arithmetic, no IEEE anywhere:
    * vectors live on the caller's integer lattice, and with
    * τ = tauNum/tauDen,
    *
    *   cos ≥ τ  ⟺  dot ≥ 0  ∧  dot²·tauDen² ≥ tauNum²·‖a‖²·‖b‖²
    *
    * — all four quantities DECIMAL(38,0) (dot² at 10⁶-scale lattices
    * overflows int64). Ties, thresholds and hit counts therefore
    * hash-check with no float conventions at all.
    *
    * Scale shape: the benchmark set is broadcast (it is small by
    * construction — same contract as [[overlap]]); the corpus scans
    * once, hits combine map-side into the per-vector summary. Linear
    * in corpus size, never corpus×corpus.
    */
  def semanticGate(corpus: DataFrame, idCol: String, vecCol: String,
      evalSet: DataFrame, evalIdCol: String, evalVecCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > tauNum, s"tau in (0,1): $tauNum/$tauDen")
    val dec = "decimal(38,0)"
    // r17: compiled exact-int64 dot kernel, and the per-SIDE norms
    // hoisted OUT of the pair expansion — na depends only on the
    // corpus row and nb only on the eval row, so each is computed
    // once per row instead of once per (corpus × eval) pair. Same
    // exact integers, |evalSet|× less norm work per corpus row.
    def dotOf(a: Column, b: Column) =
      graft.functions.expressions.TextExpressions.long_dot(a, b)
    val dot = dotOf(col(vecCol), col(evalVecCol))
    val hit = dot >= 0L &&
      dot.cast(dec) * dot.cast(dec) *
        lit(tauDen.toLong * tauDen).cast(dec) >=
      lit(tauNum.toLong * tauNum).cast(dec) *
        col("_na").cast(dec) * col("_nb").cast(dec)
    corpus.withColumn("_na", dotOf(col(vecCol), col(vecCol)))
      .crossJoin(broadcast(
        evalSet.withColumn("_nb", dotOf(col(evalVecCol), col(evalVecCol)))))
      .withColumn("_hit", hit)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_eval_hits"),
        min(when(col("_hit"), col(evalIdCol))).as("first_hit_eval"))
      .withColumn("contaminated", col("n_eval_hits") > 0L)
  }
}
