package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for q109: setup (edge dedup / degree / widen) vs
  * per-round cost, at SPARK_GRAFT_SF_DIR scale. Iteration aid only.
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the reader/codegen paths
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val b = t("scan+select") {
        val d = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
          col("l_suppkey").cast("long").as("s"),
          (col("l_partkey").cast("long") + 10000000L).as("p"))
        d
      }
      val edges = b.select(col("s").as("src"), col("p").as("dst"))
        .union(b.select(col("p").as("src"), col("s").as("dst")))
      val eRaw = edges.distinct().persist()
      t("edge distinct materialize")(eRaw.count())
      val outd = eRaw.groupBy(col("src"))
        .agg(count(lit(1)).cast("long").as("outdeg"))
      t("nodes count (groupBy over cache)")(outd.count())
      val widened = eRaw.join(outd.withColumnRenamed("src", "_ok"),
          col("src") === col("_ok"))
        .select(col("src"), col("dst"), col("outdeg")).persist()
      t("widened materialize")(widened.count())
      var rank = outd.select(col("src").as("node"))
        .withColumn("r", lit(1000000L)).localCheckpoint(true)
      for (i <- 1 to 8) {
        val rankSide = rank.withColumnRenamed("node", "src")
        val contribs = widened.join(broadcast(rankSide), Seq("src"))
          .groupBy(col("dst")).agg(sum(expr("r div outdeg")).as("sc"))
          .withColumnRenamed("dst", "node")
        val next = contribs.select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(sc, 0L)) div 100")).as("r"))
        if (i == 8) rank = t(s"rounds 1-8 as one job")(next.localCheckpoint(true))
        else rank = next
      }
      t("final count")(rank.count())
      eRaw.unpersist(); widened.unpersist()
    }
    spark.stop()
  }
}
