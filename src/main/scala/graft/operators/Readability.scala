package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sentence segmentation statistics and Flesch reading ease (Flesch
  * 1948) — the classic shallow readability axis quality-filter
  * stacks still use (long-sentence, dense-syllable text reads hard;
  * fragment storms read degenerate):
  *
  *   FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
  *
  * All counts are regex length-difference arithmetic (identical in
  * RE2 and Java regex on this ASCII surface): sentence boundaries
  * are runs of [.!?] followed by whitespace, counted over
  * rtrim(text) so a terminal punctuation run followed only by
  * trailing whitespace ("Done now! ") closes the last sentence
  * instead of double-counting as boundary AND final sentence (a
  * terminal .!? closes the last sentence without needing a
  * lookbehind — RE2 has none); the syllable proxy is vowel-group
  * runs ([aeiouy]+), the standard dictionary-free approximation.
  * Two divisions and one pinned chain per document —
  * hash-checkable.
  *
  * Scale shape: zero-shuffle projection; fuses into the feeding scan.
  */
object Readability {

  private def runCount(c: Column, pat: String): Column =
    (length(regexp_replace(c, pat, "V"))
      - length(regexp_replace(c, pat, ""))).cast("long")

  def sentenceStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val nTokens = TextFunctions.tokenCountArithmetic(t).cast("long")
    val nBound = runCount(rtrim(t), "[.!?]+\\s+")
    val nSent = when(length(t) === 0, 0L).otherwise(nBound + 1L)
    val nSyll = runCount(lower(t), "[aeiouy]+")
    val fre = lit(206.835) -
      lit(1.015) * (nTokens.cast("double") / nSent.cast("double")) -
      lit(84.6) * (nSyll.cast("double") / nTokens.cast("double"))
    df.select(col(idCol),
      nTokens.as("n_tokens"),
      nSent.as("n_sentences"),
      nSyll.as("n_syllables"),
      when(nTokens === 0L || nSent === 0L, lit(null).cast("double"))
        .otherwise(round(fre, 6)).as("flesch"))
  }
}
