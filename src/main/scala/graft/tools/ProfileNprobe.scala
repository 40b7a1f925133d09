package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of the q336 nprobe-sweep pipeline (diagnostic
  * only — replicates the operator's internal stages so each can be
  * timed behind a noop-equivalent count; the operator itself stays the
  * single production definition).
  */
object ProfileNprobe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.ProductQuantization.{lat3, latticeFrame}

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("warmup read")(emb.count())
    val lat = emb.select(col("vec_id"),
      transform(sequence(lit(1), lit(64)), j =>
        lat3(element_at(col("embedding"), j)) +
        ((((col("vec_id") % 16L) + 1L) * 7919L + j.cast("long") * 104729L)
          % 9L - 4L) * 500L).as("v3"))
    time("planted lattice")(lat.count())
    time("planted lattice materialize")(
      lat.select(sum(element_at(col("v3"), 64))).first().getLong(0))

    val nl = 16; val m = 4; val k = 8; val subDim = 16
    // coarseAssign
    def mdRanked(df: DataFrame, idCol: String, kk: Int, salt: String) = {
      val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
      val w = Window.orderBy(key, col(idCol))
      df.orderBy(key, col(idCol)).limit(kk)
        .withColumn("rank0", (row_number().over(w) - 1).cast("long"))
    }
    val coarseFrame = mdRanked(lat, "vec_id", nl, "pq_ivf1")
      .select(col("rank0").cast("int").as("_cell"), col("v3").as("_cv3"))
    val t0c = System.nanoTime()
    val coarse = coarseFrame.orderBy(col("_cell")).select(col("_cv3")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toSeq).toSeq
    println(f"coarse collect                    ${(System.nanoTime() - t0c) / 1e9}%8.2f s")
    val assigned = lat.withColumn("_cell",
      graft.functions.expressions.TextExpressions.nearest_centroid(
        transform(col("v3"), x => x.cast("double")), coarse))
    time("coarse assign")(assigned.select(sum(col("_cell"))).first().getLong(0))
    val resFrame = assigned.join(broadcast(coarseFrame), Seq("_cell"))
      .select(col("vec_id"), col("_cell"),
        zip_with(col("v3"), col("_cv3"), (a, b) => a - b).as("v3"))
    time("residuals")(resFrame.select(sum(element_at(col("v3"), 1))).first().getLong(0))
    def subspaces(df: DataFrame, vCol: String, out: String) = df
      .select(col("*"), explode(sequence(lit(0), lit(m - 1))).as("m"))
      .withColumn(out, slice(col(vCol), col("m") * subDim + 1, lit(subDim)))
      .drop(vCol)
    val codebook = subspaces(
      mdRanked(resFrame, "vec_id", k, "pq_v1")
        .select(col("rank0").as("code"), col("v3")), "v3", "c3")
    time("codebook")(codebook.count())
    val codes = subspaces(resFrame, "v3", "sub")
      .join(broadcast(codebook), Seq("m"))
      .withColumn("_d", sqDist(col("sub"), col("c3")))
      .groupBy(col("vec_id"), col("_cell"), col("m"))
      .agg(min(struct(col("_d").as("d"), col("code").as("k")))
        .getField("k").as("code"))
    time("encode (codes)")(codes.count())

    val queries = mdRanked(lat, "vec_id", 32, "pq_q1")
      .select(col("vec_id").as("q_id"), col("v3").as("qv3"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("_cdist").asc, col("_cell").asc)
    val qRes = queries.crossJoin(broadcast(coarseFrame))
      .withColumn("_cdist", sqDist(col("qv3"), col("_cv3")))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= 8)
      .select(col("q_id"), col("_cell"), col("_pr"),
        zip_with(col("qv3"), col("_cv3"), (a, b) => a - b).as("v3"))
    val tables = subspaces(qRes, "v3", "qsub")
      .join(broadcast(codebook), Seq("m"))
      .withColumn("tdist", sqDist(col("qsub"), col("c3")))
      .select(col("q_id"), col("_cell"), col("_pr"), col("m"),
        col("code"), col("tdist"))
    time("tables")(tables.count())
    val adc = codes.join(broadcast(tables), Seq("_cell", "m", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("tdist")).as("adc_dist"), min(col("_pr")).as("_pr"))
    time("adc scored")(adc.count())
    val nprobes = Seq(1, 2, 4, 8)
    val adcP = adc.persist()
    time("adc persist")(adcP.count())
    val planArr = array(nprobes.map(lit): _*)
    val cand = adcP
      .select(col("q_id"), col("vec_id"), col("adc_dist"), col("_pr"),
        explode(planArr).as("nprobe"))
      .filter(col("_pr") <= col("nprobe"))
    time("cand counts")(cand.groupBy(col("nprobe")).agg(count(lit(1))).count())
    val top = cand
      .withColumn("_packed", col("adc_dist") * 1000000L + col("vec_id"))
      .groupBy(col("nprobe"), col("q_id"))
      .agg(graft.functions.expressions.TopKByAgg
        .topKBy((-col("_packed")).cast("double"), col("vec_id"), 5).as("_top"))
    time("per-plan heaps")(top.count())
    // exact ground truth
    val exact = lat.withColumnRenamed("vec_id", "vec_id")
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("_packed", sqDist(col("qv3"), col("v3")) * 1000000L + col("vec_id"))
      .groupBy(col("q_id"))
      .agg(graft.functions.expressions.TopKByAgg
        .topKBy((-col("_packed")).cast("double"), col("vec_id"), 5).as("_top"))
    time("exact ground truth")(exact.count())
    time("exact again")(exact.count())
    adcP.unpersist()
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val starts = new scala.collection.mutable.HashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.synchronized {
            starts(js.jobId) = (js.time,
              Option(js.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .getOrElse(""))
          }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.synchronized {
            starts.get(je.jobId).foreach { case (t0, d) =>
              jobs += ((je.jobId, je.time - t0, d))
            }
          }
      })
    for (rep <- 1 to 2) {
      jobs.clear()
      time(s"FULL q336 operator rep$rep")(
        graft.operators.ProductQuantization.ivfAdcResidualNprobeSweep(lat,
          "vec_id", dims = 64, m = 4, k = 8, nQueries = 32, topK = 5,
          nprobes = Seq(1, 2, 4, 8), cbSalt = "pq_v1", qSalt = "pq_q1",
          ivfSalt = "pq_ivf1", nCorpus = emb.count()).count())
      Thread.sleep(300)
      jobs.synchronized {
        println(s"  jobs: ${jobs.size}, total job ms: ${jobs.map(_._2).sum}")
        jobs.foreach { case (id, ms, d) =>
          println(f"    job $id%3d $ms%6d ms  $d") }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
