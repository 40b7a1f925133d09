package graft.lake

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Medallion-lake layout + latest-partition discovery.
  *
  * Layout contract (reference `src/helpers.py:109-123`):
  * `<root>/<layer>/<source>/<entity>/date=YYYY-MM-DD/hour=HH`
  * — one partition written per pipeline run, consumers read only the
  * newest one. Discovery walks `date=` prefixes descending then
  * `hour=` descending (reference `latest_partition`,
  * `src/helpers.py:126-154`) via the Hadoop FileSystem API, so it
  * works on any FS Spark can reach (local, HDFS, S3A) and lists only
  * two directory levels — O(days + 24), never O(files).
  */
final case class LakePaths(root: String) {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val hourFmt = DateTimeFormatter.ofPattern("HH")

  def entityRoot(layer: String, source: String, entity: String): String =
    s"$root/$layer/$source/$entity"

  /** Partition path for a specific run time. */
  def partitionPath(layer: String, source: String, entity: String,
      at: LocalDateTime): String =
    s"${entityRoot(layer, source, entity)}/date=${at.format(dateFmt)}/hour=${at.format(hourFmt)}"

  /** Newest `date=`/`hour=` partition, or None when the entity has no
    * data (the reference raises FileNotFoundError; callers decide).
    */
  def latestPartition(spark: SparkSession, layer: String, source: String,
      entity: String): Option[String] = {
    val rootPath = new Path(entityRoot(layer, source, entity))
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return None

    def newestChild(p: Path, prefix: String): Option[Path] =
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .sortBy(_.getPath.getName)(Ordering[String].reverse)
        .headOption.map(_.getPath)

    for {
      date <- newestChild(rootPath, "date=")
      hour <- newestChild(date, "hour=")
    } yield hour.toString
  }
}
