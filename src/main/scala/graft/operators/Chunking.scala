package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping fixed-size document chunking — the context-window
  * splitter that runs between cleaning and tokenization in a training
  * pipeline (long documents become stride-overlapped windows so no
  * span is lost at a chunk boundary).
  *
  * Chunk i of a doc with length L covers 1-based character range
  * [1 + i·stride, min(1 + i·stride + size − 1, L)], for
  * i = 0 .. ceil(max(L − size, 0) / stride). Every doc yields at
  * least one chunk (the empty doc yields one empty chunk); the last
  * chunk may be shorter than `size`; consecutive chunks overlap by
  * exactly `size − stride` characters.
  *
  * Scale shape: pure per-row generate — `sequence` + `explode` with no
  * shuffle at all; chunk extraction is a codegen'd `substring`. Output
  * partitioning inherits the scan, so a downstream repartition (e.g.
  * by token-count bucket for packing) is the FIRST exchange.
  */
object Chunking {

  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "need 1 <= stride <= size")
    val len = length(col(textCol))
    // ceil(max(L-size,0)/stride) in exact integer arithmetic
    val lastIx = (greatest(len - size, lit(0)) + (stride - 1)) / stride
    docs.select(col(idCol), col(textCol).as("_t"),
        explode(sequence(lit(0), lastIx.cast("int"))).as("chunk_ix"))
      .select(col(idCol), col("chunk_ix"),
        (col("chunk_ix") * stride + 1).as("chunk_start"),
        col("_t").substr(col("chunk_ix") * stride + 1, lit(size)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
