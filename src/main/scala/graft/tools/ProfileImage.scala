package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing of the q277 image pipeline: planted-BMP fixture build
  * vs ImageIO decode+dHash (diagnostic only; the fixture SQL is
  * copied verbatim from ExtensionQueries.plantedBmps).
  */
object ProfileImage {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val q = graft.SparkEntry.queries("q277_image_dhash")
    time("warmup q277 full")(
      q(spark, dir).write.mode("overwrite").format("noop").save())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pix = docs
      .select(col("doc_id"))
      .withColumn("_base", col("doc_id") - pmod(col("doc_id"), lit(2)))
      .withColumn("_px", pmod(col("doc_id") * 7919L, lit(9)))
      .withColumn("_py", pmod(col("doc_id") * 104729L, lit(8)))
      .withColumn("_pert", pmod(col("doc_id"), lit(2)) === 1)
      .withColumn("_pix", expr(
        """concat_ws('', transform(sequence(7, 0, -1), y ->
          |  concat(
          |    concat_ws('', transform(sequence(0, 8), x ->
          |      repeat(format_string('%02x',
          |        pmod(cast(conv(substring(md5(concat(
          |            cast(_base as string), ':img:',
          |            cast(y * 9 + x as string))), 1, 2), 16, 10) as int)
          |          + (case when _pert and x = _px and y = _py
          |             then 9 else 0 end), 256)), 3))),
          |    '00')))""".stripMargin))
    for (rep <- 1 to 2) {
      time(s"fixture pix only rep$rep")(
        pix.write.mode("overwrite").format("noop").save())
      time(s"q277 full rep$rep")(
        q(spark, dir).write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
