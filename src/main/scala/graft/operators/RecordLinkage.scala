package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the
  * entity-resolution decision layer the dedup family lacks: where
  * near-dup operators ask "are these TEXTS the same", record linkage
  * asks "are these structured RECORDS the same entity", combining
  * weak per-field evidence (a name typo, a close-but-not-equal
  * balance) into one log-likelihood-ratio score with link /
  * possible / non-link thresholds.
  *
  * Exactness contract: every field weight is a PINNED integer on the
  * 1e-6 lattice (round(ln(m/u)·1e6) computed offline, embedded as
  * literals by the caller) so the pair score is an exact integer sum
  * — no IEEE in the decision path, and the score itself
  * hash-matches a SQL oracle carrying the same literals.
  *
  * Scale shape: candidates come from equi-join blocking
  * ([[blockedCandidates]]); per-block volume is (n/B)·(m/B) — the
  * caller bounds it by key choice (a production pass adds more
  * blocking keys or a df-cap, the q259 lesson). Scoring itself is a
  * zero-shuffle projection over the candidate frame: levenshtein and
  * the comparisons fuse into the join's output scan.
  */
object RecordLinkage {

  /** Integer FS weights on the 1e-6 lattice.
    *
    * `nameExact` / `nameApprox` / `nameDis` are the 3-level name
    * gamma weights (exact match, edit distance <= `nameMaxEdits`,
    * else); `numAgree` / `numDis` the binary numeric-proximity
    * weights (|a-b| <= `numTol`).
    */
  final case class FsWeights(
      nameExact: Long, nameApprox: Long, nameDis: Long,
      numAgree: Long, numDis: Long,
      nameMaxEdits: Int, numTol: Double)

  /** Equi-join candidate generation: all (a, b) pairs sharing every
    * `blockCols` value. Non-block columns are suffixed `_a` / `_b`.
    * The join is a plain equi shuffle join on the block key — never
    * a cross product; candidate volume is sum over blocks of
    * |A_block|·|B_block|.
    */
  def blockedCandidates(a: DataFrame, b: DataFrame,
      blockCols: Seq[String]): DataFrame = {
    val aCols = a.columns.filterNot(blockCols.contains)
    val bCols = b.columns.filterNot(blockCols.contains)
    val ra = aCols.foldLeft(a)((d, c) => d.withColumnRenamed(c, c + "_a"))
    val rb = bCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, c + "_b"))
    ra.join(rb, blockCols)
  }

  /** Score blocked candidates: 3-level name agreement (exact /
    * within `nameMaxEdits` edits / disagree) + binary numeric
    * proximity (|a-b| <= numTol), each mapped to its pinned integer
    * weight; `score_points` is the exact integer sum, and `decision`
    * thresholds it at `tLink` / `tNonLink` points (score >= tLink ->
    * link, score <= tNonLink -> non_link, else possible).
    */
  def fellegiSunter(cands: DataFrame,
      nameA: String, nameB: String, numA: String, numB: String,
      w: FsWeights, tLink: Long, tNonLink: Long): DataFrame = {
    val nameLevel =
      when(col(nameA) === col(nameB), lit(2))
        .when(levenshtein(col(nameA), col(nameB)) <= w.nameMaxEdits, lit(1))
        .otherwise(lit(0))
    val numAgree = abs(col(numA) - col(numB)) <= w.numTol
    val nameW =
      when(col("name_level") === 2, lit(w.nameExact))
        .when(col("name_level") === 1, lit(w.nameApprox))
        .otherwise(lit(w.nameDis))
    val numW = when(col("num_agree"), lit(w.numAgree))
      .otherwise(lit(w.numDis))
    cands
      .withColumn("name_level", nameLevel)
      .withColumn("num_agree", numAgree)
      .withColumn("score_points", nameW + numW)
      .withColumn("decision",
        when(col("score_points") >= tLink, lit("link"))
          .when(col("score_points") <= tNonLink, lit("non_link"))
          .otherwise(lit("possible")))
  }
}
