package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary plan dump — not part of the surface. */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString()
      val scans = "Scan parquet".r.findAllIn(plan).size
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(s"[scratchplan] $q: scans=$scans exchanges=$exchanges")
      println(plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("Exchange") ||
        l.contains("Join") || l.contains("Aggregate"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
