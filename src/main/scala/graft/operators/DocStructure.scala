package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-structure profiling — the markdown/code layout signals a
  * corpus router reads before deciding how to treat a document
  * (prose quality gates mis-score code; code dedup wants fences, not
  * sentences): per-document line ledger over headings, list items,
  * fenced code blocks, indented lines and blank lines, plus symbol
  * density and the longest line.
  *
  * Everything is one `split('\n')` plus per-line regex/prefix tests
  * folded with size(filter(...)) — pure array algebra, zero shuffle,
  * fuses into the feeding scan; the symbol fraction is ONE division
  * of exact character counts (q295).
  */
object DocStructure {

  private def countLines(lines: Column, pred: Column => Column): Column =
    size(filter(lines, pred)).cast("long")

  /** Per-document structure stats: (idCol, n_lines, n_blank,
    * n_heading, n_list, n_fence_lines, n_code_blocks, n_indented,
    * max_line_len, symbol_frac).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val nFence = countLines(lines, l => l.rlike("^```"))
    // stripping the alnum/space/newline class leaves exactly the
    // symbol characters — its length IS the symbol count
    val symbols = length(regexp_replace(t, "[a-zA-Z0-9 \n]", ""))
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      countLines(lines, l => trim(l) === "").as("n_blank"),
      countLines(lines, l => l.rlike("^#{1,6} ")).as("n_heading"),
      countLines(lines, l => l.rlike("^ *([-*+]|[0-9]+\\.) "))
        .as("n_list"),
      nFence.as("n_fence_lines"),
      (nFence / 2L).cast("long").as("n_code_blocks"),
      countLines(lines, l => l.rlike("^(    |\t)")).as("n_indented"),
      aggregate(lines, lit(0),
        (acc, l) => greatest(acc, length(l))).cast("long")
        .as("max_line_len"),
      when(length(t) === 0, lit(null).cast("double"))
        .otherwise(symbols.cast("double") / length(t).cast("double"))
        .as("symbol_frac"))
  }
}
