package graft.lake

import org.apache.spark.sql.DataFrame

/** Keyed-document serving sink (S10 in SURVEY.md §2.1).
  *
  * The reference `collect()`s the whole usage table to the driver and
  * bulk-posts it to Elasticsearch with `_id=icao24`
  * (`src/index_elastic.py:177,199-211`) — the scalability cliff of the
  * design. Implementations here must stay executor-side: either a
  * distributed file write or a `foreachPartition` HTTP writer; never a
  * driver materialization.
  */
trait DocumentSink {
  /** Upsert one document per `keyCol` value; rows within a call are
    * assumed already deduped to one per key (UsageProjection
    * .latestPerAircraft).
    */
  def upsert(docs: DataFrame, keyCol: String): Unit
}

/** Offline default: newline-delimited JSON, one directory per
  * generation; the newest generation is the current state of the
  * keyed store (same latest-wins contract as the ES `_id` upsert).
  * Writes are distributed (`df.write.json` — one file per partition).
  */
final class JsonDirSink(root: String) extends DocumentSink {
  // resumes past existing generations on restart — a fresh process
  // must not overwrite gen=000000 while later generations still look
  // "newest" to latest-wins readers
  private var generation = -1

  override def upsert(docs: DataFrame, keyCol: String): Unit = {
    if (generation < 0) generation = nextGeneration(docs)
    val target = f"$root/gen=$generation%06d"
    docs.write.mode("overwrite").json(target)
    generation += 1
  }

  private def nextGeneration(docs: DataFrame): Int = {
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) 0
    else {
      val gens = fs.listStatus(path).map(_.getPath.getName)
        .filter(_.startsWith("gen="))
        .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toInt).toOption)
      if (gens.isEmpty) 0 else gens.max + 1
    }
  }
}

/** Shape of a partition-local bulk HTTP writer (what an online ES sink
  * looks like without the driver bottleneck). The transport is
  * abstract — this environment has no network — but the partition
  * batching, retry accounting, and error-cap semantics (first 10
  * logged, reference `src/index_elastic.py:210-216`) are real.
  */
final class BulkHttpSink(
    post: Seq[String] => Either[String, Int], // batch of docs → error | count
    batchSize: Int = 500,
    maxLoggedErrors: Int = 10) extends DocumentSink {

  override def upsert(docs: DataFrame, keyCol: String): Unit = {
    val postFn = post
    val bs = batchSize
    val maxLog = maxLoggedErrors
    docs.toJSON.foreachPartition { (it: Iterator[String]) =>
      var logged = 0
      it.grouped(bs).foreach { batch =>
        postFn(batch) match {
          case Left(err) if logged < maxLog =>
            System.err.println(s"[bulk-sink] $err"); logged += 1
          case _ => ()
        }
      }
    }
  }
}
