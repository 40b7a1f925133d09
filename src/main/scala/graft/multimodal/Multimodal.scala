package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column convention + operators (SURVEY.md §7.5).
  *
  * A media column is an opaque `binary` payload plus a typed metadata
  * struct — the only schema that survives 100 TB of mixed media:
  *
  * {{{
  *   media: struct<
  *     payload:    binary,
  *     media_type: string,   // "image/png", "audio/wav", "video/mp4"
  *     n_bytes:    long,
  *     checksum:   string>   // sha-256 of payload
  * }}}
  *
  * Decode/resize/frame-sample are implemented as `mapPartitions` over
  * a typed Dataset with an explicit batch shape (the Scala analog of
  * a vectorized Python `mapInPandas` stage: the partition iterator is
  * consumed in fixed-size batches so a real decoder could amortize
  * per-batch model/codec setup). The *actual pixel decode is a
  * deterministic STUB* — image/audio codecs are not available in this
  * environment — but every Spark-side contract (schema, nullability,
  * partitioning, batch shape) is real and tested; swap `stubDecode`
  * for a codec call to productionize.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a raw binary column into the media struct (pure columns). */
  def asMedia(payload: Column, mediaType: Column): Column =
    struct(
      payload.as("payload"),
      mediaType.as("media_type"),
      length(payload).cast("long").as("n_bytes"),
      sha2(payload, 256).as("checksum"))

  /** Feature row produced by the decode stage. */
  case class MediaFeatures(
      width: Int, height: Int, n_frames: Int,
      mean_intensity: Double, embedding: Array[Float])

  /** STUB decoder — deterministic fake pixels derived from the payload
    * bytes. Replace with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in production; everything around it stays unchanged.
    */
  private[multimodal] def stubDecode(payload: Array[Byte], embeddingDim: Int): MediaFeatures = {
    // pretend-dimensions from header bytes; intensity = byte mean;
    // embedding = seeded rolling hash per dimension. All fully
    // deterministic in the payload alone.
    val n = payload.length
    val w = 1 + (math.abs(if (n > 0) payload(0).toInt else 0) % 64)
    val h = 1 + (math.abs(if (n > 1) payload(1).toInt else 0) % 64)
    val frames = 1 + n % 4
    val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
    val emb = Array.tabulate(embeddingDim) { d =>
      var acc = 1125899906842597L ^ (d * 0x9e3779b97f4a7c15L)
      var i = 0
      while (i < n) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
      ((acc >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    MediaFeatures(w, h, frames, mean, emb)
  }

  /** Decode + feature-extract over the media struct. Runs partition-
    * local in fixed-size batches (`batchSize` rows per decode batch).
    * Output adds a `features` struct column.
    */
  def decodeFeatures(df: DataFrame, mediaCol: String,
      embeddingDim: Int = 16, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("mean_intensity", DoubleType),
        StructField("embedding", ArrayType(FloatType))))))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { it =>
      // batch the iterator: a real decoder initializes its codec once
      // per batch — same shape a vectorized UDF runtime would use
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val media = row.getStruct(mediaIdx)
          val payload = if (media == null) Array.empty[Byte]
            else media.getAs[Array[Byte]]("payload")
          val f = stubDecode(if (payload == null) Array.empty[Byte] else payload,
            embeddingDim)
          Row.fromSeq(row.toSeq :+
            Row(f.width, f.height, f.n_frames, f.mean_intensity, f.embedding.toSeq))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-typed media: emit one row per sampled
    * frame index (explode is pure column algebra; the per-frame decode
    * happens lazily downstream in [[decodeFeatures]]).
    */
  def sampleFrames(df: DataFrame, mediaCol: String, everyNth: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0),
        greatest((col(s"$mediaCol.n_bytes") / lit(1024)).cast("int") - 1, lit(0)),
        lit(everyNth))))

  /** Resize (stub): produce a new media struct whose payload is the
    * deterministic stub "re-encode" at the target dimensions —
    * payload truncated/cycled to w·h bytes, metadata and checksum
    * recomputed by the same column algebra as [[asMedia]]. A real
    * implementation swaps ONLY the payload expression for a codec
    * call; the struct contract, sizes, and checksums stay identical.
    */
  def resizeStub(df: DataFrame, mediaCol: String, width: Int, height: Int): DataFrame = {
    val target = width * height
    // rpad on binary both truncates and zero-pads to the exact target
    // length — one pure column expression, no UDF
    val resized = expr(s"rpad($mediaCol.payload, $target, x'00')")
    df.withColumn(mediaCol,
      asMedia(resized, col(s"$mediaCol.media_type")))
  }

  /** Size-bucketed repartitioning: large payloads skew partitions;
    * bucket by payload size so each task carries comparable bytes —
    * the knob that matters at 100 TB (task-size balance), exposed as an
    * explicit operator.
    */
  def repartitionBySize(df: DataFrame, mediaCol: String, partitions: Int): DataFrame =
    df.repartitionByRange(partitions,
      col(s"$mediaCol.n_bytes"), xxhash64(col(s"$mediaCol.checksum")))
}
