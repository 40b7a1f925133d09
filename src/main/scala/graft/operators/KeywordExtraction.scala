package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-group distinctive-keyword extraction: rank each group's terms
  * by group-level TF-IDF — tf(term, group) · ln(G / gf(term)) with
  * gf = the number of GROUPS containing the term — the "what makes
  * this source different" report a corpus datasheet quotes next to
  * volume counts. Terms here are word BIGRAMS (unigram vocabularies
  * saturate every group and zero out the idf; bigrams keep the
  * contrast).
  *
  * Exactness: tf and gf are integer counts; the idf lands on the
  * 1e-8 ln-lattice once per (term, gf); the score is the exact
  * int64 product tf·lattice divided back once — and the per-group
  * top-k rank breaks ties (score DESC, term ASC), all pinned.
  *
  * Scale shape: one (group, term) count aggregate, one term-keyed
  * group-frequency aggregate (vocabulary-bounded, broadcast back),
  * and a top-k window whose partition is a GROUP's vocabulary —
  * bounded by the Zipf argument, not corpus volume.
  */
object KeywordExtraction {

  def topTerms(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"need at least one keyword: $k")
    val grams = df.select(col(groupCol),
        explode(TextFunctions.wordShingles(col(textCol), 2)).as("term"))
    val tf = grams.groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val gf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("gf"))
    val nGroups = df.select(countDistinct(col(groupCol)).as("_g"))
    val idfLat = round(log(col("_g").cast("double")
      / col("gf").cast("double")) * 1e8).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(gf, Seq("term"))
      .crossJoin(broadcast(nGroups))
      .withColumn("score",
        round((col("tf") * idfLat).cast("double") / 1e8, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k && col("score") > 0.0)
      .select(col(groupCol), col("rank"), col("term"), col("tf"),
        col("gf"), col("score"))
  }
}
