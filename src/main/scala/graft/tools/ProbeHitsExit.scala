package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prices the HITS convergence exit on q321's exact input shape:
  * microHits(iterations = 4) with the exit ARMED vs UNARMED on the
  * same warmed session — the r13 verdict #4 adjudication (q321 read
  * 3.40 s on the r13 board vs 2.34 in r12; this isolates how much of
  * that is the exit's boundary materialize+probe vs environment).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ProbeHitsExit [reps]
  */
object ProbeHitsExit {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-hits-exit")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 10000000L).as("dst"))

    def run(tag: String, armed: Boolean): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        graft.operators.Hits.microHits(edges, iterations = 4,
            convergeEarly = armed)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe-hits-exit] $tag rep$i: $sec%.2f s")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }

    // interleave so a drifting host hits both arms equally
    run("unarmed", armed = false)
    run("armed  ", armed = true)
    run("unarmed", armed = false)
    run("armed  ", armed = true)
    spark.stop()
  }
}
