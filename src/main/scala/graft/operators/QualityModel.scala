package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Linear quality-classifier scoring — the "model filter" stage of a
  * pre-training pipeline (fastText/CCNet-style quality classifiers)
  * with the MODEL APPLICATION expressed as pure column algebra, so
  * scoring 100 TB is one codegen'd scan: no UDF, no model server, no
  * driver round-trip. Weights arrive as plan literals (a trained
  * model's coefficients pasted in the same way the reference embeds
  * its driver-computed μ/σ literals).
  *
  * Determinism contract (what makes the scored output hash-checkable
  * against an external SQL oracle):
  *   - every feature is a ratio of integer counts — one IEEE double
  *     division each, identical in any engine;
  *   - the logit accumulates `w₀ + w₁f₁ + …` in a FIXED left-to-right
  *     order (one multiply + one add per term — both correctly
  *     rounded IEEE ops);
  *   - there is deliberately NO sigmoid: exp() is a transcendental
  *     with no cross-engine rounding guarantee, and the sigmoid is
  *     monotone, so the keep decision (`logit ≥ 0` ⇔ p ≥ 0.5) and any
  *     ranking are identical on the raw logit.
  *
  * Features (all reusing [[TextFunctions]] definitions): saturating
  * token count n/(n+100), distinct-token ratio, stopword ratio, mean
  * token length, punctuation ratio, uppercase ratio.
  */
object QualityModel {

  /** Pinned coefficients — stand-ins for a trained model's weights. */
  val Intercept = -1.2
  val WLen = 2.0
  val WDistinct = 1.5
  val WStop = 2.5
  val WMeanLen = -0.1
  val WPunct = -3.0
  val WUpper = -2.0

  /** (idCol, quality_logit 6 dp, keep). `keep` is decided on the
    * UNROUNDED logit.
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val withToks = df.withColumn("_toks",
      TextFunctions.tokens(lower(text)))
    val n = size(col("_toks"))
    val fLen = when(n === 0, 0.0)
      .otherwise(n.cast("double") / (n + 100).cast("double"))
    val fDistinct = TextFunctions.distinctTokenRatio(col("_toks"))
    val fStop = TextFunctions.stopwordRatioFrom(col("_toks"))
    val fMeanLen = TextFunctions.meanTokenLen(text)
    val fPunct = TextFunctions.punctRatio(text)
    val fUpper = TextFunctions.upperRatio(text)
    // fixed left-to-right accumulation — mirrored term for term in SQL
    val logit = lit(Intercept)
      .plus(lit(WLen) * fLen)
      .plus(lit(WDistinct) * fDistinct)
      .plus(lit(WStop) * fStop)
      .plus(lit(WMeanLen) * fMeanLen)
      .plus(lit(WPunct) * fPunct)
      .plus(lit(WUpper) * fUpper)
    withToks.select(col(idCol),
      round(logit, 6).as("quality_logit"),
      (logit >= 0.0).as("keep"))
  }
}
