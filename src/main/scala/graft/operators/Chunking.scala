package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * engine, the [[graft.operators.Sampling]] contract) and boundary
    * selection is a lexicographic compare on the 2-hex prefix. A doc
    * always ends with a sentinel boundary at its last character, so
    * chunks tile the text exactly; docs shorter than `window` yield
    * one whole-doc chunk.
    *
    * Scale shape: the WHOLE operator is per-row array algebra — the
    * boundary list and every chunk substring are computed inside one
    * projection, and the only generate explodes the per-doc CHUNK
    * structs (≈ L/64 rows, text already cut). No shuffle, no window,
    * and no row ever carries the full document alongside per-position
    * state (the earlier per-character explode was O(L²) bytes per doc
    * in flight). The remaining cost is the md5 per position — the
    * price of a cross-engine-checkable hash; [[gearContentDefined]]
    * is the O(1)-per-char scale path with the same assembly.
    */
  def contentDefined(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hexThreshold2: String): DataFrame = {
    require(window >= 1, "window must be positive")
    require(hexThreshold2.length == 2 &&
      hexThreshold2.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      "threshold is two lowercase hex digits")
    val detected = filter(
      sequence(lit(window), length(col("_t"))),
      i => md5(col("_t").substr(i - (window - 1), lit(window)))
        .substr(lit(1), lit(2)) < lit(hexThreshold2))
    val boundaries = when(length(col("_t")) >= window, detected)
      .otherwise(lit(Array.empty[Int]))
    assemble(docs.select(col(idCol).as("_id"), col(textCol).as("_t"))
      .filter(length(col("_t")) >= 1)
      .withColumn("_bs", withSentinel(boundaries)), idCol)
  }

  /** Content-defined chunking over the GEAR rolling hash — the
    * O(1)-per-char scale path (one compiled pass per doc, memoized
    * md5 gear table) with the SAME shuffle-free assembly and its own
    * exact positional oracle: the left-shifting update makes the low
    * `maskBits` bits of the state a pure function of the trailing
    * `maskBits` chars, so the boundary predicate has a closed window
    * form (see TextExpressions.GearBoundariesExpr). Mean chunk ≈
    * 2^maskBits chars; boundaries start at position `maskBits`.
    */
  def gearContentDefined(docs: DataFrame, idCol: String, textCol: String,
      maskBits: Int = 6): DataFrame =
    assemble(docs.select(col(idCol).as("_id"), col(textCol).as("_t"))
      .filter(length(col("_t")) >= 1)
      .withColumn("_bs", graft.functions.expressions.TextExpressions
        .gear_boundaries(col("_t"), maskBits)), idCol)

  /** Appends the end-of-doc sentinel to an ascending boundary list
    * (deduped when the last char is itself a detected boundary).
    */
  private def withSentinel(boundaries: Column): Column = {
    val len = length(col("_t"))
    when(size(boundaries) === 0 ||
        element_at(boundaries, size(boundaries)) =!= len,
      concat(boundaries, array(len))).otherwise(boundaries)
  }

  /** (_id, _t, _bs ascending boundaries incl. sentinel) → one row per
    * chunk, cut per-row inside the array (no shuffle, no window; the
    * generate emits finished chunks, never per-position state).
    */
  private def assemble(base: DataFrame, idCol: String): DataFrame = {
    val chunks = transform(
      sequence(lit(0), size(col("_bs")) - 1),
      k => {
        val start = when(k === 0, lit(1))
          .otherwise(element_at(col("_bs"), k) + 1)
        val end = element_at(col("_bs"), k + 1)
        struct((k + 1).as("chunk_ix"), start.as("chunk_start"),
          col("_t").substr(start, end - start + 1).as("chunk_text"))
      })
    base.select(col("_id").as(idCol), explode(chunks).as("_c"))
      .select(col(idCol), col("_c.chunk_ix").as("chunk_ix"),
        col("_c.chunk_start").as("chunk_start"),
        col("_c.chunk_text").as("chunk_text"))
  }

  /** Sentence-boundary chunking with one-sentence overlap — the RAG
    * splitter: chunks never cut inside a sentence, accumulate
    * sentences greedily up to `budget` tokens, and each chunk
    * re-opens with the PREVIOUS chunk's last sentence (the standard
    * retrieval-context overlap) unless that overlap would itself
    * blow the budget (then the new chunk starts fresh — guarantees
    * progress and keeps every multi-sentence chunk ≤ budget; a
    * single sentence longer than the budget becomes its own
    * over-budget chunk, the only honest option).
    *
    * Input: `stokCol` — the per-sentence token counts of the doc in
    * order (any segmentation upstream; [[graft.operators.Readability]]
    * is the house convention). One fold per doc, zero shuffle; docs
    * with no sentences yield no chunks.
    *
    * Output: (idCol, chunk_idx, s, e, tk, n_sentences) — 1-based
    * inclusive sentence range per chunk, token sum including the
    * overlap sentence.
    */
  def sentenceChunks(docs: DataFrame, idCol: String, stokCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be positive: $budget")
    val n = size(col(stokCol)).cast("long")
    val emptyChunks =
      array().cast("array<struct<s:bigint,e:bigint,tk:bigint>>")
    val idx = zip_with(sequence(lit(1L), n), col(stokCol),
      (i, t) => struct(i.as("i"), t.cast("long").as("t")))
    val folded = aggregate(idx,
      struct(lit(1L).as("cs"), lit(0L).as("ct"), lit(0L).as("ps"),
        emptyChunks.as("chunks")),
      (a, x) => {
        val i = x.getField("i"); val t = x.getField("t")
        val cs = a.getField("cs"); val ct = a.getField("ct")
        val ps = a.getField("ps"); val ch = a.getField("chunks")
        val absorb = ct === 0L || ct + t <= budget
        val overlapOk = ps + t <= budget
        struct(
          when(absorb, cs).when(overlapOk, i - 1L).otherwise(i)
            .as("cs"),
          when(absorb, ct + t).when(overlapOk, ps + t).otherwise(t)
            .as("ct"),
          t.as("ps"),
          when(absorb, ch).otherwise(concat(ch, array(struct(
            cs.as("s"), (i - 1L).as("e"), ct.as("tk"))))).as("chunks"))
      },
      a => concat(a.getField("chunks"), array(struct(
        a.getField("cs").as("s"), n.as("e"), a.getField("ct").as("tk")))))
    docs
      .withColumn("_chunks", when(n >= 1L, folded).otherwise(emptyChunks))
      .select(col(idCol), posexplode(col("_chunks")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("chunk_idx"),
        col("col.s").as("s"), col("col.e").as("e"),
        col("col.tk").as("tk"),
        (col("col.e") - col("col.s") + 1L).as("n_sentences"))
  }
}
