package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Special-token contamination audit — documents that already contain
  * a tokenizer's control strings (`<|endoftext|>`, chat-template
  * markers, BOS/EOS) silently corrupt training: the template
  * collides with real text and the model learns to emit control
  * tokens. The audit counts occurrences per (source, token) so the
  * cleaning pass knows WHERE the contamination comes from, plus the
  * affected-doc counts a gate consumes.
  *
  * Occurrence counting is the pinned length-difference arithmetic
  * (never regexp_count — the fleet's portable idiom): one projection
  * per token over one scan, then one map-side-combinable aggregate.
  */
object SpecialTokens {

  /** The control strings a curation pass screens for — the common
    * public tokenizer/chat-template markers.
    */
  val Tokens: Seq[String] = Seq(
    "<|endoftext|>", "<|im_start|>", "<|im_end|>",
    "<s>", "</s>", "[INST]", "[/INST]", "<pad>")

  /** Occurrences of literal `tok` in `text` via length difference. */
  def occurrences(text: Column, tok: String): Column =
    ((length(text) -
      length(call_function("replace", text, lit(tok), lit("")))) /
      lit(tok.length)).cast("long")

  /** Per-(source, token) contamination rollup: (srcCol, token,
    * n_docs, n_occurrences) — only tokens that actually occur, so
    * the result is the audit worklist.
    */
  def audit(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val perToken = array(Tokens.map(tok =>
      struct(lit(tok).as("token"),
        occurrences(t, tok).as("n"))): _*)
    df.select(col(srcCol), explode(perToken).as("_e"))
      .filter(col("_e.n") > 0L)
      .groupBy(col(srcCol), col("_e.token").as("token"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_e.n")).as("n_occurrences"))
  }
}
