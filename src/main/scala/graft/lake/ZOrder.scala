package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.TextExpressions

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping.
  *
  * A linear sort on one column gives perfect file-level min/max
  * pruning on that column and none on any other. Sorting by the
  * interleaved bit code of two columns clusters BOTH: each output
  * file covers a small rectangle of the (a, b) space, so parquet
  * row-group/file min-max statistics prune scans filtered on EITHER
  * column — the standard lakehouse layout technique for
  * two-predicate tables (e.g. (user, time) or (lat, lon)).
  *
  * Values are rank-normalized per column with `percent_rank` before
  * interleaving, so skewed or negative distributions spread evenly
  * across the curve.
  */
object ZOrder {

  /** Morton code of two numeric columns after rank normalization into
    * `bits`-bit grid cells.
    */
  def zValue(a: Column, b: Column, bits: Int = 15): Column = {
    import org.apache.spark.sql.expressions.Window
    val scale = (1L << bits) - 1
    val ra = (percent_rank().over(Window.orderBy(a)) * scale).cast("long")
    val rb = (percent_rank().over(Window.orderBy(b)) * scale).cast("long")
    TextExpressions.interleave_bits(ra, rb, bits)
  }

  /** Rewrite `df` into `numFiles` files clustered on the Z-curve of
    * (colA, colB). Range partitioning on the z-value gives each file a
    * contiguous curve segment = a compact rectangle in (a, b).
    *
    * NOTE: `percent_rank` over a global window is a single-partition
    * sort — fine for the per-partition file-layout step this is meant
    * for (one lake partition at a time), not for whole-table use; at
    * whole-table scale substitute a sampled quantile map per column.
    */
  def clusterByZ(
      df: DataFrame,
      colA: String,
      colB: String,
      numFiles: Int,
      bits: Int = 15): DataFrame = {
    val withZ = df.withColumn("_z", zValue(col(colA), col(colB), bits))
    withZ
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
