package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus/stream audits that answer "which inputs move the needle,
  * and do the numbers look organic": leave-one-source-out influence,
  * Benford first-digit conformance, and lead–lag cross-correlation.
  * All exact-until-one-chain, per the engine's oracle discipline.
  */
object Auditing {

  /** Leave-one-out source influence on the corpus mean of `scoreCol`
    * (6-dp values carried through DECIMAL sums): for each source,
    * what the corpus mean becomes WITHOUT it — Shapley's first
    * term, the cheap data-valuation audit. No recomputation per
    * source: the per-source (Σ, n) aggregate plus frame totals give
    * every leave-one-out mean algebraically,
    * mean₋ᵢ = (Σ − Σᵢ)/(n − nᵢ).
    *
    * Scale shape: one aggregate collapses the corpus to |sources|
    * rows; the totals are windows over that bounded frame.
    */
  def sourceInfluence(df: DataFrame, sourceCol: String, scoreCol: String)
      : DataFrame = {
    val perSource = df
      .select(col(sourceCol),
        round(col(scoreCol).cast("double"), 6)
          .cast("decimal(18,6)").as("_s"))
      .groupBy(col(sourceCol))
      .agg(sum(col("_s")).as("_si"), count(lit(1)).as("n_rows"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val meanAll = (sum(col("_si")).over(whole).cast("double")
      / sum(col("n_rows")).over(whole).cast("double"))
    val meanWithout = ((sum(col("_si")).over(whole) - col("_si")).cast("double")
      / (sum(col("n_rows")).over(whole) - col("n_rows")).cast("double"))
    perSource
      .withColumn("mean_all", round(meanAll, 6))
      .withColumn("mean_without", round(meanWithout, 6))
      .select(col(sourceCol), col("n_rows"),
        col("mean_all"), col("mean_without"),
        round(col("mean_without") - col("mean_all"), 6).as("influence"))
  }

  /** Benford first-digit audit over a positive numeric column: the
    * observed share of each leading digit next to the Benford
    * expectation log₁₀(1 + 1/d). Values are fixed to integer
    * hundredths first (`round(v·100)`) so digit extraction is string
    * arithmetic on an integer — double→string formatting differs
    * between engines, integer strings don't. One row per digit; no
    * cross-digit float sum anywhere, so every cell is one division.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol).cast("double") * 100.0).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df
      .filter(col(valueCol).cast("double") > 0.0)
      .select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val share = col("n").cast("double") / sum(col("n")).over(whole).cast("double")
    // Benford expectation as pinned literals (Double.toString-exact)
    val expected = (1 to 9).foldLeft(lit(0.0)) { (acc, d) =>
      when(col("digit") === d, lit(math.log10(1.0 + 1.0 / d))).otherwise(acc)
    }
    counts
      .withColumn("share", round(share, 6))
      .withColumn("benford_share", round(expected, 6))
      .withColumn("deviation", round(col("share") - col("benford_share"), 6))
  }

  /** Lead–lag cross-correlation of two event types' daily counts:
    * Pearson corr(A(day), B(day + lag)) for each lag in
    * [−maxLag, maxLag] — "do clicks lead purchases". Daily counts
    * are exact integers; per-lag moments are exact DECIMAL(38,0)
    * sums joined on shifted days; each correlation is the
    * assortativity chain (one sqrt·sqrt division).
    *
    * Scale shape: the event stream collapses to |days|·2 rows in one
    * aggregate; every per-lag join runs over that bounded daily
    * frame. A 10-year stream is ~3 650 rows here.
    */
  def leadLagCorr(events: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, s"lag window out of range: $maxLag")
    val daily = events
      .filter(col(typeCol).isin(typeA, typeB))
      .groupBy((unix_micros(col(tsCol)) / lit(86400000000L)).cast("long")
        .as("day"), col(typeCol).as("_t"))
      .agg(count(lit(1)).as("_n"))
    val a = daily.filter(col("_t") === typeA)
      .select(col("day"), col("_n").as("_na"))
    val b = daily.filter(col("_t") === typeB)
      .select(col("day").as("_dayb"), col("_n").as("_nb"))
    val lags = spark(events).range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val dec = "decimal(38,0)"
    val joined = a.crossJoin(broadcast(lags))
      .join(b, col("_dayb") === col("day") + col("lag"))
    val m = col("_m").cast(dec)
    val num = (m * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    val radX = (m * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    val radY = (m * col("_syy") - col("_sy") * col("_sy")).cast("double")
    joined
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("_m"),
        sum(col("_na").cast(dec)).as("_sx"),
        sum(col("_nb").cast(dec)).as("_sy"),
        sum((col("_na") * col("_nb")).cast(dec)).as("_sxy"),
        sum((col("_na") * col("_na")).cast(dec)).as("_sxx"),
        sum((col("_nb") * col("_nb")).cast(dec)).as("_syy"))
      .filter(col("_m") >= 3)
      .select(col("lag"), col("_m").as("n_days"),
        round(num / (sqrt(radX) * sqrt(radY)), 6).as("corr"))
  }

  private def spark(df: DataFrame) = df.sparkSession
}
