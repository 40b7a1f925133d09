package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the diversification stage retrieval pipelines run after dense
  * top-k: greedily pick the candidate maximizing
  *
  *   λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
  *
  * so near-duplicate results are pushed out of the final page.
  *
  * MMR is inherently sequential in k, so the implementation is the
  * standard two-stage shape: a DISTRIBUTED retrieval pass builds a
  * bounded per-query pool (top `poolSize` by exact cosine, query
  * excluded), then `k` chained columnar steps run the greedy argmax —
  * each step a join of the remaining pool against the selected set
  * (≤ poolSize·k rows per query, no driver collect anywhere). At
  * 100 TB only the first stage touches the corpus; the greedy stages
  * touch poolSize rows per query.
  *
  * Determinism: cosine via the compiled in-order kernel (the q31
  * recipe), the step score is one pinned chain
  * `λ·rel − (1−λ)·maxsim` (maxsim over the empty set is 0.0), and
  * every argmax breaks ties by (score desc, id asc) — all of it
  * replayable in SQL, so the WHOLE greedy trajectory hash-checks.
  */
object Mmr {

  def mmrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int = 5,
      poolSize: Int = 30,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolSize >= k, "need k >= 1 and poolSize >= k")
    require(lambda > 0.0 && lambda <= 1.0, "lambda in (0,1]")

    // stage 1: bounded per-query candidate pool, query excluded
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("_rel",
        VectorFunctions.cosine(col(corpusVec), col(queryVec)))
    val wPool = Window.partitionBy(col(queryId))
      .orderBy(col("_rel").desc, col(corpusId).asc)
    val pool = scored.withColumn("_pr", row_number().over(wPool))
      .filter(col("_pr") <= poolSize)
      .select(col(queryId), col(corpusId), col(corpusVec), col("_rel"))
      .localCheckpoint(true) // the greedy loop reuses it k times

    // stage 2: k chained greedy steps over the bounded pool
    var selected: DataFrame = null // (queryId, corpusId, vec, rank, score)
    for (step <- 1 to k) {
      val remaining =
        if (selected == null) pool
        else pool.join(
          selected.select(col(queryId), col(corpusId)),
          Seq(queryId, corpusId), "left_anti")
      val withPenalty =
        if (selected == null)
          remaining.withColumn("_maxsim", lit(0.0))
        else {
          val sel = selected.select(col(queryId),
            col(corpusVec).as("_svec"))
          remaining.join(sel, Seq(queryId))
            .withColumn("_s",
              VectorFunctions.cosine(col(corpusVec), col("_svec")))
            .groupBy(col(queryId), col(corpusId))
            .agg(first(col(corpusVec)).as(corpusVec),
              first(col("_rel")).as("_rel"),
              max(col("_s")).as("_maxsim"))
        }
      val scoredStep = withPenalty.withColumn("_mmr",
        lit(lambda) * col("_rel") - lit(1.0 - lambda) * col("_maxsim"))
      val wPick = Window.partitionBy(col(queryId))
        .orderBy(col("_mmr").desc, col(corpusId).asc)
      val pick = scoredStep.withColumn("_rn", row_number().over(wPick))
        .filter(col("_rn") === 1)
        .select(col(queryId), col(corpusId), col(corpusVec),
          lit(step).as("mmr_rank"), col("_mmr").as("_score"))
        .localCheckpoint(true) // truncate the growing lineage per step
      selected = if (selected == null) pick else selected.unionByName(pick)
    }
    selected.select(col(queryId), col(corpusId), col("mmr_rank"),
      round(col("_score"), 6).as("mmr_score"))
  }
}
