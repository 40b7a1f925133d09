package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge statistics — the inner loop of tokenizer
  * training: for the character-level initial vocabulary, count every
  * adjacent symbol pair across the corpus, weighted by occurrence
  * (the highest-count pair is BPE's next merge).
  *
  * Scale shape — the reason this is an operator and not a one-liner:
  * pairs are counted over the WORD-FREQUENCY TABLE, not the raw
  * corpus. The first aggregate collapses the corpus to its
  * vocabulary (|vocab| ≪ corpus size, and it stops growing — Heaps'
  * law), so the pair expansion (×|word| per row) runs over a bounded
  * frame no matter how many documents stream through the first
  * shuffle. Two hash-keyed exchanges total, both map-side-combined.
  */
object BpePairs {

  /** (left_sym, right_sym, n): total weighted count of each adjacent
    * character pair over whitespace-tokenized, lowercased words;
    * pairs with n < `minCount` are dropped (BPE never merges rare
    * pairs; the threshold keeps the result table bounded).
    */
  def pairCounts(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2) // 1-char words have no pairs
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    words
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1)," +
        " i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("f")).as("n"))
      .filter(col("n") >= minCount)
  }
}
