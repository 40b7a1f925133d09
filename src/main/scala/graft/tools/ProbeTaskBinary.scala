package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Attributes `Broadcasting large task binary` warnings to queries:
  * runs every declared query in bench order with a stderr marker
  * before each, so the DAGScheduler WARN lines interleave under the
  * query that produced them. Plan-constant sizes don't depend on the
  * scale factor, so sf0.01 suffices.
  *
  *   sbt "runMain graft.tools.ProbeTaskBinary" 2>probe.log
  *   grep -E '\[probe\]|large task binary' probe.log
  */
object ProbeTaskBinary {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-task-binary")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      System.err.println(s"[probe] >>> $name")
      System.err.flush()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
