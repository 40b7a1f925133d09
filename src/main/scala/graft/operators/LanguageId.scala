package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based language identification — the first stage of every
  * web-corpus pipeline (CCNet runs a fastText LID before anything
  * else) expressed so a 100-TB scoring pass is ONE codegen'd scan:
  * a linear classifier over character-n-gram frequency features,
  * with the trained coefficients pinned as plan literals (the same
  * embed-the-model move as QualityModel, upgraded from q229's
  * marker-token voting to a real per-language score vector).
  *
  * Exactness: the whole decision path is INTEGER arithmetic. Each
  * feature is a substring occurrence count over the space-padded
  * lowercased text (`(len(t) − len(replace(t, g, ''))) div |g|` —
  * plain string ops every engine defines identically), the weights
  * are integer-quantized (per-mille-style, as a production model
  * would ship for determinism), and because every language's score
  * shares the same length denominator, `argmax_l Σ w_{l,g}·c_g`
  * over the raw integer point totals IS the argmax of the
  * normalized probabilities — so prediction, margin and scores all
  * hash-check with zero IEEE steps except the single reported
  * `points/len` ratio (one division, bit-identical cross-engine).
  * Ties break to the lexicographically smallest language code; a
  * zero best score (no evidence) predicts NULL rather than
  * fabricating the first class.
  *
  * Scale shape: no shuffle at all — a projection chain (counts →
  * integer scores → fold-argmax) that stays inside whole-stage
  * codegen; the model rides the plan, not a join.
  */
object LanguageId {

  /** Pinned integer coefficients: language → (char-n-gram, weight),
    * language codes ascending (the tie-break order). Grams include
    * their word-boundary spaces where the cue is a function word.
    */
  val Model: Seq[(String, Seq[(String, Long)])] = Seq(
    "de" -> Seq(" der " -> 95L, " und " -> 90L, " die " -> 85L,
      " ist " -> 70L, " nicht " -> 65L, "sch" -> 45L),
    "en" -> Seq(" the " -> 95L, " and " -> 85L, " of " -> 75L,
      " to " -> 60L, "ing " -> 55L, " is " -> 50L),
    "es" -> Seq(" el " -> 90L, " los " -> 85L, " por " -> 70L,
      " una " -> 65L, " con " -> 45L, " es " -> 40L),
    "fr" -> Seq(" le " -> 90L, " les " -> 85L, " est " -> 75L,
      " dans " -> 70L, " et " -> 60L, " une " -> 55L),
    "it" -> Seq(" il " -> 90L, " che " -> 85L, " di " -> 75L,
      "zione " -> 65L, " per " -> 55L, " la " -> 40L),
    "pt" -> Seq(" uma " -> 90L, " os " -> 80L, " das " -> 75L,
      " para " -> 70L, " com " -> 55L, " as " -> 45L))

  /** Every distinct gram, in first-appearance order (the pinned
    * feature order shared with the SQL oracle generator).
    */
  val Grams: Seq[String] = Model.flatMap(_._2.map(_._1)).distinct

  /** Adds `lang_pred` (null when no feature fires), `score_points`
    * (the winning integer point total), `margin_points` (winner −
    * runner-up, 0 on a tie) and `rel_score` (points per padded
    * char — the one IEEE division, identical cross-engine).
    */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = concat(lit(" "), lower(col(textCol)), lit(" "))
    val withT = df.withColumn("_t", t).withColumn("_n",
      length(col("_t")).cast("long"))
    // one replace-count per DISTINCT gram, materialized as columns so
    // the per-language score chains reference them instead of
    // re-inlining the string scan
    val gramIdx = Grams.zipWithIndex.toMap
    val counted = withT.withColumns(Grams.zipWithIndex.map {
      case (g, i) =>
        s"_c$i" -> expr(
          s"cast((length(_t) - length(replace(_t, '$g', ''))) div" +
            s" ${g.length} as bigint)")
    }.toMap)
    val scored = counted.withColumns(Model.map { case (lang, terms) =>
      s"_s_$lang" -> terms.map { case (g, w) =>
        lit(w) * col(s"_c${gramIdx(g)}")
      }.reduce(_ + _)
    }.toMap)
    // fold-argmax over the pinned language order: strict > keeps the
    // earlier (lexicographically smaller) code on ties
    val init = struct(col(s"_s_${Model.head._1}").as("s"),
      lit(Model.head._1).as("l"))
    val best = Model.tail.foldLeft(init) { case (acc, (lang, _)) =>
      when(col(s"_s_$lang") > acc.getField("s"),
        struct(col(s"_s_$lang").as("s"), lit(lang).as("l")))
        .otherwise(acc)
    }
    val pointsDesc = sort_array(
      array(Model.map(m => col(s"_s_${m._1}")): _*), asc = false)
    val out = scored
      .withColumn("_best", best)
      .withColumn("lang_pred",
        when(col("_best.s") > 0L, col("_best.l")))
      .withColumn("score_points", col("_best.s"))
      .withColumn("margin_points",
        element_at(pointsDesc, 1) - element_at(pointsDesc, 2))
      .withColumn("rel_score",
        col("_best.s").cast("double") / col("_n").cast("double"))
    out.drop((Seq("_t", "_n", "_best") ++
      Grams.indices.map(i => s"_c$i") ++
      Model.map(m => s"_s_${m._1}")): _*)
  }

  /** The DuckDB mirror of [[classify]] rooted on a CTE `src`
    * providing (doc_id-ish `idCol`, `textCol`): emits the SQL for a
    * SELECT whose columns are `idCol, lang_pred, score_points,
    * margin_points, rel_score` — generated from the SAME Model
    * constants so the two sides cannot desync.
    */
  def oracleSelect(src: String, idCol: String, textCol: String): String = {
    val gramIdx = Grams.zipWithIndex.toMap
    val cnt = Grams.zipWithIndex.map { case (g, i) =>
      s"(length(t) - length(replace(t, '$g', ''))) // ${g.length} AS c$i"
    }.mkString(",\n    ")
    val sc = Model.map { case (lang, terms) =>
      terms.map { case (g, w) => s"$w * c${gramIdx(g)}" }
        .mkString(" + ") + s" AS s_$lang"
    }.mkString(",\n    ")
    // stepwise fold-argmax: b<k>s / b<k>l carry the running winner
    val folds = Model.tail.zipWithIndex.map { case ((lang, _), k) =>
      val prevS = if (k == 0) s"s_${Model.head._1}" else s"b${k}s"
      val prevL = if (k == 0) s"'${Model.head._1}'" else s"b${k}l"
      (s"CASE WHEN s_$lang > $prevS THEN s_$lang ELSE $prevS END AS b${k + 1}s",
        s"CASE WHEN s_$lang > $prevS THEN '$lang' ELSE $prevL END AS b${k + 1}l")
    }
    val foldCols = folds.map(f => s"${f._1},\n    ${f._2}").mkString(",\n    ")
    val kLast = Model.size - 1
    val ptsList = Model.map(m => s"s_${m._1}").mkString(", ")
    s"""lid_t AS (
       |  SELECT $idCol, ' ' || lower($textCol) || ' ' AS t FROM $src),
       |lid_c AS (
       |  SELECT $idCol, length(t) AS n,
       |    $cnt
       |  FROM lid_t),
       |lid_s AS (
       |  SELECT $idCol, n,
       |    $sc
       |  FROM lid_c),
       |lid_b AS (
       |  SELECT *, list_sort([$ptsList], 'DESC') AS pts,
       |    $foldCols
       |  FROM lid_s),
       |lid_out AS (
       |  SELECT $idCol,
       |    CASE WHEN b${kLast}s > 0 THEN b${kLast}l END AS lang_pred,
       |    CAST(b${kLast}s AS BIGINT) AS score_points,
       |    CAST(pts[1] - pts[2] AS BIGINT) AS margin_points,
       |    CAST(b${kLast}s AS DOUBLE) / CAST(n AS DOUBLE) AS rel_score
       |  FROM lid_b)""".stripMargin
  }
}
