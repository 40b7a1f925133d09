package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** UniMax sampling-budget allocation (Chung et al. 2023, "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale
  * Multilingual Pretraining"): given a total training-token budget B
  * and a per-source repeat ceiling of E epochs, give every source as
  * equal a share as possible WITHOUT repeating any source more than
  * E times — i.e. waterfill  alloc_i = min(cap_i, t)  with
  * cap_i = c_i·E and the level t chosen so Σ alloc_i = B (all caps
  * if Σ cap_i ≤ B). The published algorithm walks sources in
  * ascending-size order handing out fair shares; that walk IS the
  * waterfill, computed here in closed form per candidate segment:
  *
  *   t_j = (B − Σ_{i<j} cap_i) / (n − j + 1)   (caps sorted asc)
  *
  * is the level iff cap_{j−1} ≤ t_j ≤ cap_j — a window expression,
  * no iteration, no driver math.
  *
  * Scale shape: ONE per-source aggregate (map-side partial sums over
  * however many trillion tokens) collapses the corpus to an n-source
  * frame; every window after that runs over those n rows — n is the
  * source-domain cardinality (tens), so the constant-partition
  * windows are bounded by construction, never by data volume.
  * Integer allocations (`floor(t)` at the level) keep the output
  * exact and hashable; Σ alloc may undershoot B by < n tokens.
  */
object Unimax {

  /** Per-source allocation: (source, n_tokens, cap_tokens,
    * alloc_tokens, epochs 6-dp). `budgetFrac` sets
    * B = floor(total_tokens · budgetFrac).
    */
  def allocate(df: DataFrame, sourceCol: String, textCol: String,
      budgetFrac: Double = 0.5, maxEpochs: Int = 4): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= maxEpochs,
      s"budget fraction out of range: $budgetFrac")
    require(maxEpochs >= 1, s"epoch cap must be positive: $maxEpochs")
    val perSource = df
      .groupBy(col(sourceCol))
      .agg(sum(TextFunctions.tokenCountArithmetic(col(textCol)))
        .cast("long").as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * maxEpochs)

    val whole = Window.partitionBy(lit(1))
    val ord = whole.orderBy(col("cap_tokens"), col(sourceCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, -1)

    // window-of-window needs projection stages: candidates first,
    // then the min over valid candidates picks the level
    perSource
      .withColumn("_budget",
        floor(sum(col("n_tokens")).over(whole).cast("double") * budgetFrac)
          .cast("long"))
      .withColumn("_sprev", coalesce(sum(col("cap_tokens")).over(run), lit(0L)))
      .withColumn("_rn", row_number().over(ord))
      .withColumn("_n", count(lit(1)).over(whole))
      .withColumn("_prevcap", lag(col("cap_tokens"), 1).over(ord))
      .withColumn("_t_cand", (col("_budget") - col("_sprev")).cast("double")
        / (col("_n") - col("_rn") + 1).cast("double"))
      .withColumn("_valid",
        col("_t_cand") <= col("cap_tokens").cast("double") &&
          (col("_rn") === 1 ||
            col("_prevcap").cast("double") <= col("_t_cand")))
      .withColumn("_t",
        min(when(col("_valid"), col("_t_cand"))).over(whole))
      .select(col(sourceCol), col("n_tokens"), col("cap_tokens"),
        when(col("_t").isNull, col("cap_tokens"))
          .otherwise(least(col("cap_tokens"), floor(col("_t")).cast("long")))
          .as("alloc_tokens"))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double")
          / col("n_tokens").cast("double"), 6))
  }

  /** Temperature-scaled mixture weights at T = 2 (the mT5/XLM-R
    * published setting): sample source s with probability
    * w_s ∝ p_s^(1/T) = √p_s ∝ √tokens_s — the corpus total cancels,
    * so the weight basis is one √ per source snapped to the 1e-4
    * lattice (r4 = round(√tokens·10⁴)), every share ONE division of
    * exact integers, and the per-source token allocation under
    * `budget` an exact half-up lattice division (the q272 trick).
    * [[allocate]] is the cap-aware alternative; this is the smooth
    * upsampling curve between proportional (T=1) and uniform (T=∞).
    *
    * Scale shape: one count aggregate (source-bounded), one 2-scalar
    * broadcast back — the mechanism never sees row volume.
    */
  def sqrtTemperatureWeights(df: DataFrame, sourceCol: String,
      textCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be positive: $budget")
    val dec = "decimal(38,0)"
    val perSource = df.groupBy(col(sourceCol))
      .agg(sum(TextFunctions.tokenCountArithmetic(col(textCol)))
        .cast("long").as("n_tokens"))
      .withColumn("_r4",
        round(sqrt(col("n_tokens").cast("double")) * 10000.0, 0)
          .cast("long"))
    val tot = perSource.agg(sum(col("n_tokens")).as("_nt"),
      sum(col("_r4")).as("_rt"))
    val a = lit(2L).cast(dec) * lit(budget).cast(dec) *
      col("_r4").cast(dec) + col("_rt").cast(dec)
    val b2 = lit(2L).cast(dec) * col("_rt").cast(dec)
    perSource.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_tokens"),
        (col("n_tokens").cast("double") / col("_nt").cast("double"))
          .as("p_raw"),
        (col("_r4").cast("double") / col("_rt").cast("double"))
          .as("w_temp"),
        ((a - pmod(a, b2)) / b2).cast("long").as("alloc_tokens"))
  }
}
