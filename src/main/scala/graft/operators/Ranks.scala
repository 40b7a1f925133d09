package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank 1..N by an arbitrary key — the two-level rank
  * (range-partition by the key so partitions tile the total order,
  * rank within partitions, add per-partition offsets from a P-row
  * driver cumsum) generalized from Sampling.globalOrderRank's
  * hash-order special case to any (keys..., idCol) order. The
  * boundary-invariance argument is unchanged: ranges are contiguous
  * in the full sort key, so offset + local rank is the exact global
  * rank wherever repartitionByRange's sampled cuts land.
  *
  * The LOCAL rank is monotonically_increasing_id arithmetic over the
  * partition-sorted frame (`_mid − min(_mid per partition)`), NOT a
  * `Window.partitionBy(_pid)`: Catalyst cannot know that `_pid` rows
  * are already co-located (it is the partition id!), so the window
  * form inserts a second full `Exchange hashpartitioning(_pid)` on
  * the data — a redundant 100-TB-scale shuffle. The mid ids are
  * consecutive within a partition in row order, the sort pins that
  * order, and the per-partition min rides the SAME bounded P-row
  * aggregate as the counts, so the rewrite costs nothing and drops
  * the big side to exactly ONE exchange (the range partition). The
  * frame is pinned with persist() between the stats and rank passes
  * and the result is localCheckpoint()ed before release.
  */
object Ranks {

  /** Returns the input columns plus `rankCol` (long, 1..N). The total
    * order is (keys..., idCol) — idCol makes it total, so the rank is
    * deterministic under any partitioning.
    */
  def globalRankBy(df: DataFrame, idCol: String, rankCol: String,
      keys: Seq[Column], partitions: Int = 32): DataFrame = {
    val (out, ranged) = rankedUnpinned(df, idCol, rankCol, keys, partitions)
    try out.localCheckpoint() finally ranged.unpersist()
  }

  /** The pre-checkpoint rank frame plus the pinned intermediate (so
    * the caller controls unpersist) — package-private so the plan
    * suite can assert the single-exchange shape directly.
    */
  private[graft] def rankedUnpinned(df: DataFrame, idCol: String,
      rankCol: String, keys: Seq[Column], partitions: Int)
      : (DataFrame, DataFrame) = {
    require(partitions >= 1, s"partitions must be positive: $partitions")
    val orderCols = keys :+ col(idCol)
    val ranged = df
      .repartitionByRange(partitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      // both ids are nondeterministic expressions, so Catalyst keeps
      // them ABOVE the sort: _mid is assigned in sorted row order
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
      .persist()
    val stats = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_c"), min(col("_mid")).as("_m0"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0L
    val offsets = stats.map { case (pid, c, m0) =>
      val off = cum; cum += c; (pid, off, m0)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off", "_m0")
    val out = ranged
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn(rankCol, col("_off") + (col("_mid") - col("_m0")) + 1L)
      .drop("_pid", "_off", "_m0", "_mid")
    (out, ranged)
  }

  /** Spearman rank correlation between two columns, permutation
    * convention: each column ranks by (value, id) — a TOTAL order, so
    * there are no ties and the classic closed form
    *
    *   ρ = 1 − 6·Σd² / (n·(n²−1))
    *
    * is exact. Σd² accumulates in DECIMAL(38,0) (d² ≤ n², summed n
    * times ⇒ n³ — past int64 at ~2 M rows) and ONE division closes
    * the chain. Two two-level global ranks (no one-partition
    * window), one join on id, one aggregate.
    */
  def spearman(df: DataFrame, idCol: String, xCol: String, yCol: String,
      partitions: Int = 32): DataFrame = {
    val rx = globalRankBy(df.select(col(idCol), col(xCol)), idCol, "_rx",
      Seq(col(xCol)), partitions).select(col(idCol), col("_rx"))
    val ry = globalRankBy(df.select(col(idCol), col(yCol)), idCol, "_ry",
      Seq(col(yCol)), partitions).select(col(idCol), col("_ry"))
    val dec = "decimal(38,0)"
    rx.join(ry, Seq(idCol))
      .agg(count(lit(1)).as("n"),
        sum(((col("_rx") - col("_ry")) * (col("_rx") - col("_ry")))
          .cast(dec)).as("_sd2"))
      .select(col("n"), col("_sd2").cast("long").as("sum_d2"),
        round(lit(1.0) - (lit(6.0) * col("_sd2").cast("double"))
          / (col("n").cast(dec)
            * (col("n").cast(dec) * col("n").cast(dec) - lit(1)))
            .cast("double"), 6).as("spearman_rho"))
  }

  /** Token-balanced shard assignment by snake (boustrophedon) order:
    * rank rows by weight DESC, then stripe rank r to shard
    * `r mod 2S < S ? r mod S : S−1−(r mod S)` — the classic LPT
    * approximation without any sequential state: consecutive heavy
    * rows land on DIFFERENT shards and each 2S-block hands every
    * shard one heavy and one light row. Returns per-row assignments;
    * aggregate for the balance report.
    */
  def snakeShards(df: DataFrame, idCol: String, weightCol: String,
      shards: Int): DataFrame = {
    require(shards >= 2, s"need at least 2 shards: $shards")
    val ranked = globalRankBy(df.select(col(idCol), col(weightCol)),
      idCol, "_rank", Seq(col(weightCol).desc))
    val r0 = ranked.col("_rank") - 1L // 0-based
    val m = r0 % (2L * shards)
    ranked.withColumn("shard",
        when(m < shards, m).otherwise(lit(2L * shards) - 1L - m)
          .cast("int"))
      .select(col(idCol), col(weightCol), col("_rank").as("rank"),
        col("shard"))
  }
}
