package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verbatim cross-document span detection — the substring-level
  * complement of the document-level dedup family: find every length-k
  * character window (sampled at `stride`) that appears verbatim in
  * two or more documents. This is the scalable first stage of
  * "train-set memorization" audits and substring-level dedup (the
  * exact-substring variant of what MinHash does at document level).
  *
  * Scale shape: the gram generator is shuffle-free (sequence +
  * substring inside one projection, ~len/stride grams per doc — a
  * bounded ×k/stride data expansion), and the only exchange is the
  * gram groupBy. Pruning (doc-id projection, length filter) happens
  * before the expansion. At 100 TB the group key should be a 128-bit
  * hash of the gram rather than the gram text to bound shuffle width;
  * here the gram itself is carried because the declared output keys
  * on md5(gram) and the oracle must group identically.
  */
object SpanOverlap {

  /** (gram_hash, n_docs, n_occ) for every length-`k` window at
    * `stride` offsets (1-based positions 1, 1+stride, …) occurring in
    * ≥ 2 distinct documents. Exact — no sketching; windows shorter
    * than k (doc tails and short docs) are not emitted.
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      stride: Int): DataFrame =
    docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol).as("doc_id"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - ${k - 1}, $stride)," +
          s" i -> substring($textCol, i, $k))")).as("g"))
      .groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .select(md5(col("g")).as("gram_hash"), col("n_docs"), col("n_occ"))
}
