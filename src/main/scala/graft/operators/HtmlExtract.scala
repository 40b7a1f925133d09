package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a web-crawl corpus
  * runs (the trafilatura-lite stage): drop script/style/comment
  * blocks, strip tags, decode the common entities, collapse
  * whitespace. Expressed as a pinned chain of regexp_replace /
  * replace steps over patterns that are RE2-and-Java portable
  * (inline (?is) flags, lazy quantifiers, no lookaround), so the
  * extracted text hash-checks cross-engine and a 100-TB extraction
  * is one codegen'd scan — no parser library, no UDF. (A browser-
  * grade HTML5 parser handles pathological markup better; for
  * crawl-scale text mining the regex chain is the standard
  * trade-off and every step here is auditable.)
  *
  * Entity decode order is the safe single pass: named/numeric
  * entities first, `&amp;` LAST — decoding `&amp;` first would
  * double-decode `&amp;lt;` into `<`.
  */
object HtmlExtract {

  /** Regex removal steps, in pinned order (applied with the global
    * flag; (?is) inline so the same pattern string runs in both
    * engines).
    */
  val RegexSteps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)<[^>]+>" -> " ")

  /** Literal entity folds, in pinned order — `&amp;` must be LAST. */
  val EntitySteps: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** The extracted text of `html`. */
  def extractText(html: Column): Column = {
    val stripped = RegexSteps.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val decoded = EntitySteps.foldLeft(stripped) { case (c, (from, to)) =>
      // literal fold — expr-level replace(), not a regex
      call_function("replace", c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-row extraction audit: (idCol, text, n_chars_html,
    * n_chars_text).
    */
  def stats(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
      extractText(col(htmlCol)).as("text"),
      length(col(htmlCol)).cast("long").as("n_chars_html"),
      length(extractText(col(htmlCol))).cast("long").as("n_chars_text"))

  /** Anchor pattern: group 1 = href, group 2 = inner markup. Both
    * engines return match groups in document order, so the two
    * group-extractions zip positionally.
    */
  val AnchorPattern: String =
    "(?is)<a[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
  val TitlePattern: String = "(?is)<title[^>]*>(.*?)</title>"
  val MetaDescPattern: String =
    "(?is)<meta\\s+name=\"description\"\\s+content=\"([^\"]*)\""
  val CanonicalPattern: String =
    "(?is)<link\\s+rel=\"canonical\"\\s+href=\"([^\"]*)\""

  /** One row per anchor: (idCol, href_raw, is_absolute, href_canon —
    * null for relative hrefs — anchor_text with inner markup
    * stripped). The anchor-text link graph is the classic IR
    * relevance signal; extraction is two aligned group-extractions
    * zipped and exploded, still one scan.
    */
  def anchors(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        regexp_extract_all(col(htmlCol), lit(AnchorPattern), lit(1))
          .as("_h"),
        regexp_extract_all(col(htmlCol), lit(AnchorPattern), lit(2))
          .as("_t"))
      .select(col(idCol),
        explode(arrays_zip(col("_h"), col("_t"))).as("_a"))
      .select(col(idCol), col("_a._h").as("href_raw"),
        col("_a._t").as("_raw_anchor"))
      .withColumn("is_absolute", col("href_raw").rlike("(?i)^https?://"))
      .withColumn("href_canon", when(col("is_absolute"),
        UrlCanon.canonicalize(col("href_raw"))))
      .withColumn("anchor_text", extractText(col("_raw_anchor")))
      .drop("_raw_anchor")

  /** Page-level head metadata: (idCol, title, meta_description,
    * canonical_raw, canonical_url) — titles/descriptions run through
    * the same entity/whitespace fold; the rel=canonical target is
    * canonicalized when present (empty-match → null).
    */
  def pageMeta(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    val canonicalRaw = regexp_extract(h, CanonicalPattern, 1)
    df.select(col(idCol),
      extractText(regexp_extract(h, TitlePattern, 1)).as("title"),
      extractText(regexp_extract(h, MetaDescPattern, 1))
        .as("meta_description"),
      canonicalRaw.as("canonical_raw"),
      when(canonicalRaw =!= "", UrlCanon.canonicalize(canonicalRaw))
        .as("canonical_url"))
  }

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** The DuckDB expression mirroring [[extractText]] over `expr` —
    * generated from the SAME step tables.
    */
  def extractSql(expr: String): String = {
    val stripped = RegexSteps.foldLeft(expr) { case (e, (pat, rep)) =>
      s"regexp_replace($e, '${sqlLit(pat)}', '${sqlLit(rep)}', 'g')"
    }
    val decoded = EntitySteps.foldLeft(stripped) { case (e, (from, to)) =>
      s"replace($e, '${sqlLit(from)}', '${sqlLit(to)}')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
