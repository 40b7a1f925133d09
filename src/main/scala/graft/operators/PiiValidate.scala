package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Checksum-validated PII detection — the precision upgrade over
  * shape-only scrubbing (q97's regex pass): a 13–16-digit run is only
  * a payment card if it passes the Luhn checksum, and a dotted quad
  * is only an IP if every octet is ≤ 255. Shape-only masking over
  * 100 TB destroys order numbers, timestamps and version strings;
  * validation-gated masking is what a production redaction pass
  * ships, and the candidate/valid split it reports is the signal for
  * tuning the patterns.
  *
  * All pure column algebra: candidates via `regexp_extract_all`
  * (lookaround guards keep runs embedded in longer digit strings
  * out), the Luhn sum as a bounded per-candidate digit fold (≤ 16
  * digits), octet checks as split+cast comparisons, and the
  * redaction as a fold of literal `replace`s over the VALIDATED
  * candidates only. Zero shuffle; fuses into the feeding scan; every
  * count and the scrubbed text hash-check cross-engine (q293).
  */
object PiiValidate {

  /** Candidate card runs: 13–16 consecutive digits not embedded in a
    * longer digit run. Boundary GROUPS rather than lookaround (RE2
    * has no lookbehind, and the oracle replays the same pattern);
    * the payload is capture group 2. Consecutive candidates need ≥ 2
    * non-digit chars between them (the left boundary of the next
    * match must not be consumed) — natural text always has that.
    */
  val CardPattern = "(^|[^0-9])([0-9]{13,16})([^0-9]|$)"

  /** Candidate dotted quads, same boundary-group scheme. */
  val Ipv4Pattern =
    "(^|[^0-9.])([0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})" +
      "([^0-9.]|$)"

  /** The Luhn sum of a digit string: digit at position j from the
    * RIGHT (1-based) doubles when j is even, subtracting 9 past 9;
    * a valid number's sum divides by 10.
    */
  def luhnSum(s: Column): Column =
    aggregate(
      sequence(lit(1), length(s)),
      lit(0),
      (acc, i) => {
        val d = s.substr(i, lit(1)).cast("int")
        val dd = d * 2
        acc + when(pmod(length(s) - i + 1, lit(2)) === 0,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })

  /** Every octet of a dotted quad is ≤ 255 (the regex already bounds
    * them to 1–3 digits, so int casts are safe).
    */
  def ipValid(s: Column): Column =
    forall(split(s, "\\."), o => o.cast("int") <= 255)

  /** Per-document validated-PII audit: (idCol, n_card_candidates,
    * n_cards_valid, n_ipv4_candidates, n_ipv4_valid, scrubbed) —
    * only VALIDATED matches are masked in `scrubbed`.
    */
  def audit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("_t"),
      regexp_extract_all(col(textCol), lit(CardPattern), lit(2)).as("_cc"),
      regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(2)).as("_ic"))
      .select(col(idCol), col("_t"),
        filter(col("_cc"), c => luhnSum(c) % 10 === 0).as("_cv"),
        size(col("_cc")).cast("long").as("n_card_candidates"),
        filter(col("_ic"), ipValid _).as("_iv"),
        size(col("_ic")).cast("long").as("n_ipv4_candidates"))
      .select(col(idCol),
        col("n_card_candidates"),
        size(col("_cv")).cast("long").as("n_cards_valid"),
        col("n_ipv4_candidates"),
        size(col("_iv")).cast("long").as("n_ipv4_valid"),
        aggregate(col("_iv"),
          aggregate(col("_cv"), col("_t"),
            (acc, c) => call_function("replace", acc, c, lit("<CARD>"))),
          (acc, c) => call_function("replace", acc, c, lit("<IP>")))
          .as("scrubbed"))
}
