package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.SketchExpressions

/** Bloom-filter runtime filter for joins whose build side is far more
  * selective than the probe side's scan.
  *
  * At 100 TB the expensive part of `fact ⋈ dim(filtered)` is not the
  * join itself but shuffling every fact row that will never match. A
  * bloom filter over the build side's join keys (built with one
  * executor-side aggregate; bits are order-independent so the filter
  * is deterministic under any partitioning) is broadcast inside a
  * compiled probe expression and applied AT THE SCAN, so non-matching
  * fact rows die before the exchange. The exact join still runs on
  * the survivors — bloom false positives are removed there — so the
  * composed result is bit-identical to the plain join. This is the
  * hand-rolled form of Spark's own `spark.sql.optimizer.runtime.
  * bloomFilter` rewrite, exposed as an operator so the pruning is
  * explicit, tunable, and testable.
  *
  * Sizing: bits ≈ -n·ln(fpp)/ln2², so 1 M keys at 1 % fpp ≈ 1.2 MB —
  * broadcastable far beyond the hashed-relation limit. For dim sides
  * past ~100 M keys the filter itself stops being broadcastable;
  * that regime should fall back to a plain shuffle join.
  */
object RuntimeFilter {

  /** Exact inner equi-join `probe ⋈ build` on long keys, with the
    * probe side pre-pruned by a bloom filter over `build[buildKey]`.
    *
    * @param expectedItems bloom sizing hint; pass (an upper bound on)
    *                      the build side's distinct key count
    */
  def bloomPrunedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // sentinel key: Spark's stat.bloomFilter NPEs on an EMPTY build
    // side (null aggregate buffer). One impossible key keeps the
    // build non-empty; it can only add a false positive, which the
    // exact join removes — correctness unaffected.
    val keys = build.select(col(buildKey).cast("long").as("_bk"))
      .union(build.sparkSession.range(1)
        .select(org.apache.spark.sql.functions.lit(Long.MinValue).as("_bk")))
    val bloom = keys.stat.bloomFilter("_bk", expectedItems + 1, fpp)
    val pruned = probe.filter(
      SketchExpressions.bloomMightContain(col(probeKey), bloom))
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
