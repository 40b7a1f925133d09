package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Head-to-head for the dense-site nearest join (q65's inputs): the
  * adaptive grid path vs the broadcast window form on the SAME data.
  * Prints one JSON line with best-of-3 seconds for each. Run with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like [[Bench]].
  */
object BenchGridRace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => DataFrame, runs: Int): Double = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn.write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => fn.count() }
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }

    val grid = time(queries.ExtensionQueries.qNearestSiteDense(spark, sfDir), 3)
    // min_by scores the same |customers|·|sites| volume as the window
    // form but skips its per-key sort — the strongest exhaustive
    // contender. ONE run: the first attempt ran best-of-3 and spent
    // 30+ min single-threaded (the 15k-customer probe side is one
    // parquet split, and a broadcast nested-loop join parallelizes
    // only over probe partitions — itself a finding: the exhaustive
    // form needs an explicit repartition that the grid form doesn't),
    // and the verdict is an order-of-magnitude call, not a ±20% one
    val minBy = time(queries.ExtensionQueries.qNearestSiteDenseMinBy(spark, sfDir), 1)
    // single run: the window form shuffles |customers|·|sites| rows —
    // the regime mismatch being demonstrated; repeating it teaches
    // nothing, and SPARK_GRAFT_RACE_WINDOW=0 skips it entirely (at
    // sf0.1 it runs for tens of minutes)
    val window =
      if (sys.env.get("SPARK_GRAFT_RACE_WINDOW").contains("0")) Double.NaN
      else time(queries.ExtensionQueries.qNearestSiteDenseWindow(spark, sfDir), 1)
    println(f"""{"grid_sec":$grid%.3f,"minby_sec":$minBy%.3f,"window_sec":$window%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
