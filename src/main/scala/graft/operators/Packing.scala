package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (SURVEY.md §7.5 extension
  * family): documents are conceptually concatenated in id order into
  * one token stream and split into fixed-budget chunks; each document
  * is assigned the chunk containing its first token. This is the
  * standard concat-and-chunk packing — the operator computes each
  * doc's global token start offset and pack id without ever building
  * the stream.
  *
  * Scale design: the global prefix sum is the textbook two-level
  * recipe — range-partition by id, per-partition window prefix sums
  * (partition-local sort only), then one tiny per-partition-totals
  * frame (rows = #partitions) turned into base offsets and broadcast
  * back. No global-ordering window over the data ever exists, so the
  * plan has no single-partition sort of the corpus — the only
  * all-to-one step is over the #partitions-row totals frame.
  */
object Packing {

  /** @param idCol      unique orderable doc id (pack order)
    * @param nTokensCol per-doc token count
    * @param budget     tokens per pack (sequence length)
    * @return (idCol, nTokensCol, start_offset, pack_id)
    */
  def packByTokenBudget(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // repartitionByRange gives non-overlapping id ranges per partition,
    // so partition-local prefix sums + partition base offsets compose
    // to the exact global prefix sum. The result is independent of the
    // (sampled) range boundaries — determinism does not rest on them.
    val parted = df.select(col(idCol), col(nTokensCol).cast("long").as(nTokensCol))
      .repartitionByRange(col(idCol))
      .withColumn("_pid", spark_partition_id())
    val wIn = Window.partitionBy(col("_pid")).orderBy(col(idCol))
    val local = parted.withColumn("_local_end", sum(col(nTokensCol)).over(wIn))
    // one row per partition — the single-partition window below is
    // O(#partitions), not O(rows)
    val wBase = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy(col("_pid"))
      .agg(max(col("_local_end")).as("_ptotal"))
      .withColumn("_base", coalesce(sum(col("_ptotal")).over(wBase), lit(0L)))
      .select(col("_pid"), col("_base"))
    local.join(broadcast(bases), Seq("_pid"))
      .withColumn("start_offset", col("_base") + col("_local_end") - col(nTokensCol))
      .withColumn("pack_id", floor(col("start_offset") / budget).cast("long"))
      .select(col(idCol), col(nTokensCol), col("start_offset"), col("pack_id"))
  }
}
