package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) lake tables: the zero-shuffle join path for
  * 100 TB fact-to-fact joins.
  *
  * A table written with `bucketBy(n, key)` + `sortBy(key)` is
  * physically hash-partitioned into n files per partition by the key
  * at WRITE time. Two tables bucketed the same way join with neither
  * an Exchange nor (with sorted buckets) a Sort in the plan — the
  * shuffle is paid once at ingest instead of on every query. This is
  * the batch-lake analog of co-partitioned stream-stream joins, and
  * the recipe for repeated large-scale joins (orders ⋈ lineitem every
  * night) where per-query shuffles of the big sides dominate.
  *
  * Spark's bucketing rides the catalog (`saveAsTable`) — a plain
  * `.parquet(path)` write drops the bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Inner-join two co-bucketed tables on their bucket key. With equal
    * bucket counts the planner proves both sides' partitioning and
    * emits a shuffle-free sort-merge join.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
