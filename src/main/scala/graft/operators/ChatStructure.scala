package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Conversation-structure accounting for SFT/chat training data — the
  * validation pass an instruction-tuning pipeline runs before
  * templating: a conversation is an `array<struct<role, content>>`
  * column, and the stats are the loss-masking ledger (assistant
  * tokens are the supervised ones), the role histogram, and the
  * structural gates chat templates assume (roles alternate after an
  * optional leading system turn; the last turn is the assistant's —
  * a trailing user turn trains nothing).
  *
  * Pure array algebra — size/filter/aggregate/element_at over the
  * message array (element access on Spark's array data is O(1), so
  * the adjacent-role scan is linear); zero shuffles, fuses into the
  * feeding scan. Token counts use the fleet's whitespace arithmetic
  * (TextFunctions.tokenCountArithmetic), so every number is
  * SQL-replayable.
  */
object ChatStructure {

  private def roleCount(msgs: Column, role: String): Column =
    size(filter(msgs, m => m.getField("role") === role)).cast("long")

  private def tokensOf(msgs: Column, role: String): Column =
    aggregate(
      filter(msgs, m => m.getField("role") === role),
      lit(0L),
      (acc, m) => acc +
        TextFunctions.tokenCountArithmetic(m.getField("content")).cast("long"))

  /** Per-conversation stats: (idCol, n_turns, n_system, n_user,
    * n_assistant, assistant_tokens, user_tokens, assistant_frac,
    * alternates, ends_with_assistant).
    *
    * `alternates` = no two CONSECUTIVE turns share a role (the
    * leading-system case is just a role like any other — system
    * followed by user alternates; system,system does not).
    */
  def turnStats(df: DataFrame, idCol: String, msgsCol: String)
      : DataFrame = {
    val msgs = col(msgsCol)
    val aTok = tokensOf(msgs, "assistant")
    val uTok = tokensOf(msgs, "user")
    val sTok = tokensOf(msgs, "system")
    val total = aTok + uTok + sTok
    val samePair = transform(
      sequence(lit(1), size(msgs) - 1),
      i => element_at(msgs, i).getField("role")
        === element_at(msgs, i + 1).getField("role"))
    df.select(col(idCol),
      size(msgs).cast("long").as("n_turns"),
      roleCount(msgs, "system").as("n_system"),
      roleCount(msgs, "user").as("n_user"),
      roleCount(msgs, "assistant").as("n_assistant"),
      aTok.as("assistant_tokens"),
      uTok.as("user_tokens"),
      when(total === 0L, lit(null).cast("double"))
        .otherwise(round(aTok.cast("double") / total.cast("double"), 6))
        .as("assistant_frac"),
      // single-turn conversations vacuously alternate (the guard is
      // the Spark descending-sequence trap: sequence(1, 0) = [1, 0])
      when(size(msgs) <= 1, lit(true))
        .otherwise(!array_contains(samePair, true)).as("alternates"),
      (size(msgs) > 0 &&
        element_at(msgs, size(msgs)).getField("role") === "assistant")
        .as("ends_with_assistant"))
  }

  /** Loss-mask / truncation ledger: what a context window of
    * `contextTokens` actually trains on. SFT masks the loss to
    * assistant tokens, and packing truncates each conversation to
    * the context budget FROM THE FRONT — so the number that matters
    * is the assistant tokens that SURVIVE truncation, per
    * conversation: an 8k-context run over long conversations can
    * silently lose most of its supervised signal in the tail turns.
    *
    * Output: (idCol, total_tokens, trainable_tokens, trainable_kept,
    * trainable_lost, kept_frac, fits_context). kept_frac is ONE
    * division of exact integers (null when nothing is trainable).
    *
    * One `aggregate` fold over the message array carrying
    * (position, trainable, kept) — linear per row, zero shuffle,
    * fuses into the feeding scan.
    */
  def lossMask(df: DataFrame, idCol: String, msgsCol: String,
      contextTokens: Long): DataFrame = {
    require(contextTokens > 0, s"context must be positive: $contextTokens")
    val lim = lit(contextTokens)
    val zero = struct(lit(0L).as("pos"), lit(0L).as("train"),
      lit(0L).as("kept"))
    val folded = aggregate(
      col(msgsCol), zero,
      (acc, m) => {
        val len = TextFunctions
          .tokenCountArithmetic(m.getField("content")).cast("long")
        val pos = acc.getField("pos")
        val isA = m.getField("role") === "assistant"
        val kept = greatest(lit(0L),
          least(pos + len, lim) - least(pos, lim))
        struct(
          (pos + len).as("pos"),
          (acc.getField("train") + when(isA, len).otherwise(0L))
            .as("train"),
          (acc.getField("kept") + when(isA, kept).otherwise(0L))
            .as("kept"))
      })
    df.select(col(idCol), folded.as("_f"))
      .select(col(idCol),
        col("_f.pos").as("total_tokens"),
        col("_f.train").as("trainable_tokens"),
        col("_f.kept").as("trainable_kept"),
        (col("_f.train") - col("_f.kept")).as("trainable_lost"),
        when(col("_f.train") === 0L, lit(null).cast("double"))
          .otherwise(col("_f.kept").cast("double") /
            col("_f.train").cast("double")).as("kept_frac"),
        (col("_f.pos") <= lim).as("fits_context"))
  }
}
