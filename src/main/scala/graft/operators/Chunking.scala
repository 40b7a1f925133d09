package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Content-defined chunking (CDC): a boundary lands AFTER position
    * `i` wherever the hash of the `window`-char span ending at `i`
    * falls under `hexThreshold2` (two lowercase hex digits; "04" ⇒
    * p = 4/256, mean chunk ≈ 64 chars). Unlike fixed chunking, an
    * insertion early in a document shifts only the ONE chunk it lands
    * in — every later boundary re-synchronizes because it depends
    * only on local content. That self-healing alignment is what makes
    * CDC the dedup-friendly chunker (rsync/LBFS lineage), and at
    * span-level dedup scale it means edits don't cascade re-hashes
    * across a document's chunk list.
    *
    * Portable-exact: the window hash is md5 (identical hex in every
    * engine, the [[graft.operators.Sampling]] contract), boundary
    * selection is a lexicographic compare on the 2-hex prefix, and
    * chunk assembly is one per-doc window over the boundary list —
    * the only exchange, keyed by doc id. A doc always ends with a
    * sentinel boundary at its last character, so chunks tile the text
    * exactly; docs shorter than `window` yield one whole-doc chunk.
    */
  def contentDefined(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hexThreshold2: String): DataFrame = {
    require(window >= 1, "window must be positive")
    require(hexThreshold2.length == 2 &&
      hexThreshold2.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      "threshold is two lowercase hex digits")
    val base = docs.select(col(idCol).as("_id"), col(textCol).as("_t"))
      .filter(length(col("_t")) >= 1)
    val detected = base
      .filter(length(col("_t")) >= window)
      .select(col("_id"),
        explode(expr(s"sequence($window, length(_t))")).as("i"),
        col("_t"))
      .filter(substring(md5(
          expr(s"substring(_t, i - ${window - 1}, $window)")), 1, 2)
        < hexThreshold2)
      .select(col("_id"), col("i"))
    val sentinel = base.select(col("_id"), length(col("_t")).as("i"))
    val wb = Window.partitionBy(col("_id")).orderBy(col("i"))
    detected.union(sentinel).distinct()
      .withColumn("chunk_start", coalesce(lag(col("i"), 1).over(wb) + 1, lit(1)))
      .withColumn("chunk_ix", row_number().over(wb))
      .join(base, Seq("_id"))
      .select(col("_id").as(idCol), col("chunk_ix"),
        col("chunk_start"),
        expr("substring(_t, chunk_start, i - chunk_start + 1)").as("chunk_text"))
  }
}
