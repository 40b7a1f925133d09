package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest — the data-skipping half of
  * the lake layout story.
  *
  * [[ZOrder.clusterByZ]] arranges rows so each output file covers a
  * compact rectangle of the clustered column space; this manifest
  * records that rectangle so the READ path can skip whole files
  * without opening them. Parquet already prunes row groups from footer
  * statistics, but only *after* an open + footer read per file — at
  * 100 TB / 100 K-file scale the per-file request cost (S3 GET, HDFS
  * NameNode round-trip) dominates for selective scans. A manifest is
  * one driver-side read that prunes the file LIST itself, the same
  * architecture as Delta/Iceberg data skipping: stats travel with the
  * table, scans touch only intersecting files.
  *
  * Stats are collected in ONE distributed pass over the table (group
  * by `_metadata.file_path`, min/max per column) — the collected
  * result is O(files × columns), bounded by layout, never O(rows).
  * Min/max are kept as doubles (numeric, date and timestamp columns
  * are cast), which is exact for the int/date key domains it targets;
  * a null min/max (all-null file) disables pruning for that file.
  *
  * The manifest lives at `<dir>/_graft_manifest.tsv` — the leading
  * underscore keeps it invisible to parquet directory scans. Layout
  * rewrites ([[Compaction.compact]], re-clustering) must re-run
  * [[write]]; [[scan]] refuses a manifest older than the newest data
  * file, so a stale manifest fails loudly instead of silently reading
  * a superseded layout.
  */
object StatsManifest {

  val ManifestName = "_graft_manifest.tsv"

  /** Inclusive min/max interval of one column in one file. */
  final case class FileStats(
      file: String, rows: Long, mins: Map[String, Option[Double]],
      maxs: Map[String, Option[Double]])

  /** Collects per-file stats for `columns` and writes the manifest.
    * Returns the number of data files recorded.
    */
  def write(spark: SparkSession, dir: String, columns: Seq[String]): Int = {
    require(columns.nonEmpty, "at least one column to index")
    val aggs = columns.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"min:$c"),
        max(col(c).cast("double")).as(s"max:$c"))
    } :+ count(lit(1)).as("rows")
    val stats = spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // O(files): one row per data file
    val sb = new StringBuilder
    sb.append("# graft stats manifest v1\tcolumns=")
      .append(columns.mkString(",")).append('\n')
    stats.foreach { r =>
      sb.append(r.getAs[String]("file")).append('\t')
        .append(r.getAs[Long]("rows"))
      columns.foreach { c =>
        def cell(k: String): String =
          if (r.isNullAt(r.fieldIndex(k))) "null"
          else java.lang.Double.toString(r.getAs[Double](k))
        sb.append('\t').append(cell(s"min:$c")).append('\t').append(cell(s"max:$c"))
      }
      sb.append('\n')
    }
    val path = new Path(dir, ManifestName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    stats.length
  }

  /** Loads the manifest (driver-side, one small read). */
  def read(spark: SparkSession, dir: String): Seq[FileStats] = {
    val path = new Path(dir, ManifestName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty)
    val cols = lines.head.split('\t')(1).stripPrefix("columns=").split(',').toSeq
    lines.tail.toSeq.map { line =>
      val f = line.split('\t')
      def cell(s: String): Option[Double] =
        if (s == "null") None else Some(java.lang.Double.parseDouble(s))
      FileStats(f(0), f(1).toLong,
        cols.zipWithIndex.map { case (c, i) => c -> cell(f(2 + 2 * i)) }.toMap,
        cols.zipWithIndex.map { case (c, i) => c -> cell(f(3 + 2 * i)) }.toMap)
    }
  }

  /** Files whose recorded [min, max] intersects EVERY `[lo, hi]` range
    * (both bounds inclusive). Files with no stats for a ranged column
    * are kept — pruning is only ever an optimization, never a filter.
    */
  def selectFiles(manifest: Seq[FileStats],
      ranges: Seq[(String, Double, Double)]): Seq[String] =
    manifest.filter { fsr =>
      ranges.forall { case (c, lo, hi) =>
        (fsr.mins.get(c).flatten, fsr.maxs.get(c).flatten) match {
          case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
          case _ => true
        }
      }
    }.map(_.file)

  /** Manifest-pruned scan: reads only the files that can contain rows
    * in `ranges`. The result is a SUPERSET of the matching rows (file
    * granularity) — callers apply the exact predicate on top, which
    * Spark then also pushes into the surviving parquet footers, so the
    * two-level skipping composes: manifest prunes files, footers prune
    * row groups.
    */
  def scan(spark: SparkSession, dir: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestMod = fs.getFileStatus(new Path(dir, ManifestName))
      .getModificationTime
    val newestData = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getModificationTime).maxOption.getOrElse(0L)
    require(manifestMod >= newestData,
      s"stats manifest in $dir is older than the data — re-run StatsManifest.write after layout changes")
    val files = selectFiles(read(spark, dir), ranges)
    if (files.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(files: _*)
  }
}
