package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge (upsert) into a parquet table — the table-level analog
  * of the reference's Elasticsearch `_id = icao24` bulk upsert
  * (`src/index_elastic.py:199-211`): after a merge, the table holds
  * exactly one row per key, the newest by the ordering column.
  *
  * Implementation: union current table + updates, keep the top-1 row
  * per key by (ord desc, tie-break), rewrite, swap the directory in
  * (same temp-write → rename protocol as [[Compaction]]). One shuffle
  * on the key; no driver materialization. The swap is two renames, so
  * there is a brief window where the directory is absent — a merge
  * that crashes inside it is repaired on the next call, which
  * restores the backup before doing anything else.
  *
  * Scale note: rewriting the whole table per merge is the
  * copy-on-write strategy (Delta/Iceberg CoW) — correct and simple,
  * amortized by merging micro-batches BEFORE applying (the
  * `foreachBatch` pattern), and by partition pruning when the key
  * space is partition-aligned. Merge-on-read log-structured variants
  * trade that rewrite for read-side merge cost.
  */
object Upsert {

  /** Merge `updates` into the table at `dir` by `key`, newest by
    * `ord` wins (ties by the key itself are impossible post-dedup;
    * ties in `ord` across current/update rows resolve to updates via
    * the `_src` bit). Creates the table if absent.
    */
  def mergeByKey(
      spark: SparkSession,
      dir: String,
      updates: DataFrame,
      key: String,
      ord: Column): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new Path(path.getParent, s".${path.getName}_premerge")

    // crash recovery: a previous merge may have died between the two
    // renames (table moved aside, replacement not yet in place). The
    // backup IS the table then — restore it instead of treating the
    // missing directory as a first write (which would silently lose
    // every pre-crash row once the backup was cleaned up).
    if (!fs.exists(path) && fs.exists(backup)) {
      if (!fs.rename(backup, path)) {
        throw new java.io.IOException(
          s"upsert: interrupted merge left $backup; restore failed")
      }
    }

    if (!fs.exists(path)) {
      // first write: still dedup the batch itself
      dedupByKey(updates, key, ord).write.parquet(dir)
      return
    }

    val current = spark.read.parquet(dir).withColumn("_src", lit(0))
    val merged = dedupByKey(
      current.unionByName(updates.withColumn("_src", lit(1))),
      key, ord, tieBreak = Seq(col("_src").desc))
      .drop("_src")

    val tmp = new Path(path.getParent, s".${path.getName}_merging")
    fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    fs.delete(backup, true)
    if (!fs.rename(path, backup)) {
      throw new java.io.IOException(s"upsert: cannot move $path aside")
    }
    if (!fs.rename(tmp, path)) {
      fs.rename(backup, path)
      throw new java.io.IOException(s"upsert: cannot swap in $tmp")
    }
    fs.delete(backup, true)
  }

  /** Newest row per key by (ord desc, tieBreak...) — row_number, not
    * dropDuplicates, so "newest" is well-defined.
    */
  def dedupByKey(
      df: DataFrame,
      key: String,
      ord: Column,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((ord.desc +: tieBreak): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
