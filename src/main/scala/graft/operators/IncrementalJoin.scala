package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of a join view — the join half of the
  * incremental-pipeline pair ([[IncrementalAgg]] is the aggregate
  * half): when disjoint delta slices dA, dB arrive on top of base
  * slices A0, B0,
  *
  *   (A0 ∪ dA) ⋈ (B0 ∪ dB) = (A0⋈B0) ∪ (dA⋈B0) ∪ (A0⋈dB) ∪ (dA⋈dB)
  *
  * so a maintained view only needs the three delta terms appended —
  * at 100 TB the difference between re-joining two full tables per
  * batch and joining a day's delta against the base. The identity is
  * exact set algebra (inner join distributes over disjoint unions):
  * no approximation, no ordering sensitivity.
  *
  * Scale notes: the two terms that touch a base side (dA⋈B0, A0⋈dB)
  * should broadcast the DELTA side — deltas are small by construction;
  * Spark's planner does this from size stats when the deltas come
  * from filtered scans, and callers can wrap with `broadcast()` when
  * they don't. dA⋈dB is delta×delta — negligible.
  */
object IncrementalJoin {

  /** The three delta terms of the maintained view `A ⋈ B` on `keys` —
    * union the result with the stored `A0 ⋈ B0` to get the full view.
    * Slices MUST be disjoint (A0 ∩ dA = ∅, B0 ∩ dB = ∅); overlap
    * double-counts, exactly as re-inserting a row would.
    */
  def viewDelta(
      aBase: DataFrame,
      aDelta: DataFrame,
      bBase: DataFrame,
      bDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    aDelta.join(bBase, keys)
      .unionByName(aBase.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
}
