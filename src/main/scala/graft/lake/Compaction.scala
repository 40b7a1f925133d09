package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for lake partitions.
  *
  * A 1-minute micro-batch cadence (the reference's, and any streaming
  * sink's) accretes thousands of tiny parquet files per partition;
  * at 100 TB the NameNode/listing pressure and per-file open cost
  * dominate scan time long before the bytes do. Compaction rewrites a
  * partition directory into ⌈bytes / targetFileBytes⌉ files and swaps
  * it in (write to sibling temp dir → rename). Readers never see a
  * MIX of layouts; the swap is two renames, so there is a brief
  * window where the directory is absent — a compaction that crashes
  * inside it is repaired on the next call, which restores the backup
  * before doing anything else.
  *
  * Coalesce (not repartition) keeps the rewrite shuffle-free: each
  * output task concatenates whole input splits.
  */
object Compaction {

  /** Returns the number of files after compaction. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backupPath = new Path(path.getParent, s".${path.getName}_precompact")

    // crash recovery: an interrupted swap left the table at the backup
    // location — restore it before compacting
    if (!fs.exists(path) && fs.exists(backupPath)) {
      if (!fs.rename(backupPath, path)) {
        throw new java.io.IOException(
          s"compaction: interrupted swap left $backupPath; restore failed")
      }
    }

    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val numFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(path.getParent, s".${path.getName}_compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .coalesce(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    val backup = backupPath
    fs.delete(backup, true)
    if (!fs.rename(path, backup)) {
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    }
    if (!fs.rename(tmp, path)) {
      // roll back: restore the original directory
      fs.rename(backup, path)
      throw new java.io.IOException(s"compaction: cannot swap in $tmp")
    }
    fs.delete(backup, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    after
  }
}
