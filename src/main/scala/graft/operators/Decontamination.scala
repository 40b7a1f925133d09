package graft.operators

import org.apache.spark.sql.DataFrame
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
}
