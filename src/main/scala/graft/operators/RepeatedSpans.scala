package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-document repeated-substring span detection — the
  * ExactSubstr shape of Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better"), re-expressed relationally in
  * token space: a token k-gram occurring in at least `minDocs`
  * DISTINCT documents marks its position; per document, marked
  * positions whose gap is ≤ k merge into MAXIMAL repeated spans
  * [span_start, span_end) (token indices, 0-based, end-exclusive) —
  * the passages a span-level dedup pass would cut, where the
  * document-level passes (q25/q26) would either drop the whole
  * document or miss the shared boilerplate entirely.
  *
  * The paper builds a suffix array; a suffix array is a single-node
  * data structure. The relational equivalent is a positional k-gram
  * postings list: any repeated substring of length ≥ k contains a
  * repeated k-gram, and a maximal run of flagged k-gram starts at
  * positions p₁ < … < pₘ (gaps ≤ k) covers exactly the repeated
  * region [p₁, pₘ + k). Runs with gap = k merge too (the two k-grams
  * are adjacent, so the covered token interval is contiguous).
  *
  * Scale shape: one narrow postings explode — only
  * (md5-prefix hash, doc_id, pos) travels, never the gram text — a
  * count-distinct-docs aggregate over the gram hash, one hash join
  * back to flag positions, and a per-document ordered window whose
  * partition is bounded by document length. Nothing quadratic: unlike
  * pairwise dedup there is NO self-join anywhere — a gram shared by
  * 10⁶ documents costs 10⁶ postings rows (linear), not 10¹² pairs,
  * so the stop-word-grade-element exposure the containment family
  * has to prune away (Dedup.containmentPairsIndexed's prefix filter)
  * cannot arise here by construction.
  *
  * Determinism: spans are a pure set function of the corpus (no
  * sampling, no floats), so the operator hash-checks end to end; the
  * 16-hex md5 prefix group key is replayed verbatim by the oracle
  * (collisions would need ~2³² distinct grams — and would affect both
  * engines identically).
  */
object RepeatedSpans {

  /** Positional k-grams of a token array as "w1 w2 … wk" strings —
    * built by folding k aligned slices through zip_with (the
    * TextFunctions.wordTrigrams pattern generalized): the token
    * array is referenced k times total, NOT once per position, which
    * keeps CollapseProject from inlining the tokenizer O(n) times
    * (the measured O(n²) trap documented on wordTrigrams). Caller
    * must ensure size(toks) ≥ k. Gram i (0-based) covers tokens
    * [i, i+k).
    */
  def positionalKGrams(toks: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    require(k >= 2, s"k-gram order must be >= 2: $k")
    val m = size(toks) - (k - 1)
    (2 to k).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), m),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Per-document maximal repeated spans: (doc, span_start, span_end,
    * span_len, n_grams), token indices 0-based end-exclusive.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"a span repeated in < 2 docs is not repeated: $minDocs")
    val toks = TextFunctions.tokens(col(textCol))
    val postings = df
      .select(col(idCol), toks.as("_tk"))
      .filter(size(col("_tk")) >= k)
      .select(col(idCol), posexplode(positionalKGrams(col("_tk"), k)))
      .select(col(idCol), col("pos"),
        substring(md5(col("col")), 1, 16).as("_h"))

    // gram document frequency — the only corpus-wide aggregate
    val frequent = postings.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("_h"))

    val flagged = postings.join(frequent, "_h")
      .select(col(idCol), col("pos"))

    // gaps-and-islands per document: a new span starts when the gap
    // to the previous flagged gram exceeds k (gap = k still touches)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val newSpan = when(col("pos") - lag(col("pos"), 1).over(w) > k, 1)
      .otherwise(0) // first row: lag is null → comparison null → 0
    flagged
      .withColumn("_island", sum(newSpan).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_island"))
      .agg(min(col("pos")).cast("int").as("span_start"),
        (max(col("pos")) + k).cast("int").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"),
        col("n_grams"))
  }

  /** Corpus-level repeated-text budget: per document, total tokens,
    * tokens inside repeated spans, and the repeated fraction — the
    * number a span-dedup pass reports before cutting. Documents with
    * no repeated span appear with zero (left join), so the output is
    * a full-corpus accounting, not just the offenders.
    */
  def repeatedTokenBudget(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, k, minDocs)
      .groupBy(col(idCol))
      .agg(sum(col("span_len")).cast("long").as("repeated_tokens"),
        count(lit(1)).as("n_spans"))
    df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("repeated_tokens"), lit(0L)).as("repeated_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        round(when(col("n_tokens") === 0, 0.0)
          .otherwise(coalesce(col("repeated_tokens"), lit(0L)).cast("double")
            / col("n_tokens").cast("double")), 6).as("repeated_frac"))
  }
}
