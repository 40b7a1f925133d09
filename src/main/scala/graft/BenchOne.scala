package graft

import org.apache.spark.sql.SparkSession

/** Times a single declared query in isolation:
  * `runMain graft.BenchOne <queryName> [reps]` with
  * `SPARK_GRAFT_SF_DIR` set — the per-query iteration loop the full
  * Bench is too slow for.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      // SAME sink as the full Bench (noop write): count() would let
      // Catalyst prune every output-only expression subtree and
      // under-report queries whose cost is in the projected columns
      // (q143 reads 0.6 s under count vs its true 2.4 s materialized)
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name rep$i: $sec%.2f s")
      // same per-rep cleanup as Bench.runOnce (apples-to-apples):
      // drop leaked result-checkpoint blocks before the next rep
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
