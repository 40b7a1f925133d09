package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode text normalization - the cleanup pass a corpus pipeline
  * runs BEFORE tokenization/dedup so that typographically-variant
  * duplicates (smart-quoted rewraps of the same article, NBSP
  * layouts, soft-hyphenated prints) collapse to one canonical form:
  * an NFKC-lite fold expressed entirely as translate/replace/one
  * whitespace regex - identical semantics in any engine (both Spark
  * and DuckDB implement Postgres-style translate where unmatched
  * `from` characters DELETE, and RE2/Java `\s` agree on the ASCII
  * whitespace class), zero shuffle, codegen'd.
  *
  * Pinned fold, in order:
  *  1. delete invisibles: ZWSP/ZWNJ/ZWJ/BOM/soft-hyphen;
  *  2. fold typographic punctuation 1:1: curly/low-9 double quotes
  *     and guillemets to double quote, curly/low-9 single quotes to
  *     apostrophe, en/em/horizontal-bar dashes to hyphen,
  *     NBSP/thin/narrow/ideographic spaces to space;
  *  3. ellipsis to three dots (1 to 3 chars, so a replace, not
  *     translate);
  *  4. collapse whitespace runs to one space and trim.
  */
object TextNormalize {

  /** Invisible characters deleted outright: ZWSP, ZWNJ, ZWJ, BOM,
    * soft hyphen. (Built via toChar so no invisible literal hides in
    * the source.)
    */
  val ZeroWidth: String =
    Seq(0x200B, 0x200C, 0x200D, 0xFEFF, 0x00AD).map(_.toChar).mkString

  /** 1:1 typographic folds (parallel strings): double-quote family
    * and guillemets, single-quote family, dash family, exotic
    * spaces.
    */
  val FoldFrom: String =
    (Seq(0x201C, 0x201D, 0x201E, 0x00AB, 0x00BB) ++ // double quotes
      Seq(0x2018, 0x2019, 0x201A) ++                // single quotes
      Seq(0x2013, 0x2014, 0x2015) ++                // dashes
      Seq(0x00A0, 0x2009, 0x202F, 0x3000)           // exotic spaces
      ).map(_.toChar).mkString
  val FoldTo: String = "\"\"\"\"\"" + "'''" + "---" + "    "

  require(FoldFrom.length == FoldTo.length, "fold tables must align")

  private val Ellipsis = 0x2026.toChar.toString

  /** The canonical form of `text`. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(translate(text, ZeroWidth, ""), FoldFrom, FoldTo),
        Ellipsis, "..."),
      "\\s+", " "))

  /** Per-row normalization audit: (idCol, text_norm, n_chars_raw,
    * n_chars_norm, n_invisible, changed).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = col(textCol)
    df.select(col(idCol),
      normalize(raw).as("text_norm"),
      length(raw).cast("long").as("n_chars_raw"),
      length(normalize(raw)).cast("long").as("n_chars_norm"),
      (length(raw) - length(translate(raw, ZeroWidth, "")))
        .cast("long").as("n_invisible"),
      (normalize(raw) =!= raw).as("changed"))
  }

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** The DuckDB expression mirroring [[normalize]] over `expr` -
    * generated from the SAME fold tables so they cannot desync.
    */
  def normalizeSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(" +
      s"translate(translate($expr, '${sqlLit(ZeroWidth)}', '')," +
      s" '${sqlLit(FoldFrom)}', '${sqlLit(FoldTo)}')," +
      s" '$Ellipsis', '...', 'g'), '\\s+', ' ', 'g'))"

  /** The DuckDB expression for the invisible-character count. */
  def invisibleCountSql(expr: String): String =
    s"length($expr) - length(translate($expr, '${sqlLit(ZeroWidth)}', ''))"
}
