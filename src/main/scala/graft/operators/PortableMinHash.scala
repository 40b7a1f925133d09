package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash-LSH near-duplicate detection over a PORTABLE signature —
  * the standard one-base-hash affine family, bit-identical in every
  * engine — so the banded operator itself (not just its exhaustive
  * verify stage) can be hash-checked against an external SQL oracle.
  * This is the [[PortableSimHash]] recipe applied to MinHash; the
  * engine's fast path ([[Dedup.minHashNearDupPairs]], xxhash +
  * affine-permutation compiled kernel) keeps the same shape and
  * remains the non-portable variant.
  *
  * Unlike SimHash banding (lossless by pigeonhole), MinHash banding is
  * probabilistic: a qualifying pair is emitted only if it ALSO collides
  * in at least one band. The oracle therefore reproduces the band
  * predicate exactly — `∃ band: all `rows` minhashes equal` — rather
  * than approximating the operator with an exhaustive-Jaccard filter,
  * making the check exact, not statistical.
  *
  * Semantics (the dedup family's conventions throughout):
  *   - shingle set: lowercase, whitespace split, empties dropped, then
  *     DISTINCT space-joined `shingleWords`-grams (explicit slice +
  *     concat_ws algebra — mirrors SQL `array_to_string(tk[i:i+k-1])`
  *     1:1); docs with fewer than `shingleWords` tokens emit nothing
  *   - signature slot j (j = 0..numHashes-1): min over shingles of
  *     `(A_j·base(t) + B_j) mod P` with `base(t)` = the first 15 hex
  *     digits of md5(t) as an integer mod P = 2³¹−1 — the exact
  *     constants and the SQL mirror live on
  *     [[graft.functions.expressions.TextExpressions.PortableMinHashSigExpr]]
  *   - band b covers signature slots [b·rows, (b+1)·rows); its key is
  *     the '|'-joined decimal slice
  *   - output: (id_a < id_b) pairs that share ≥ 1 band key AND have
  *     exact token-set Jaccard ≥ threshold, jaccard rounded to 6 dp
  *
  * Scale shape: identical to the fast path — one pass computes
  * (doc_id, sig) at ONE md5 per shingle (the affine family replaced
  * the md5-per-(j,shingle) hex-string mins that cost 12 s at sf0.1);
  * the candidate shuffle carries only (band, key, id) rows; token sets
  * are re-attached only to the deduped candidate pairs for the exact
  * verify. Nothing quadratic.
  */
object PortableMinHash {

  /** (doc_id, toks, sig): distinct shingle set and the numHashes-slot
    * portable signature. Docs too short to shingle are dropped (no
    * signature is defined; the SQL mirror's unnest emits no rows for
    * them either).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleWords: Int): DataFrame = {
    val tk = TextFunctions.tokens(lower(col(textCol)))
    // shingle i = the k tokens starting at 1-based position i, joined
    // by ' ' — explicit slice/concat_ws so the SQL mirror is literal
    val shingles = array_distinct(transform(
      sequence(lit(1), size(col("_tk")) - (shingleWords - 1)),
      i => concat_ws(" ", slice(col("_tk"), i, lit(shingleWords)))))
    df.select(col(idCol).as("doc_id"), tk.as("_tk"))
      .filter(size(col("_tk")) >= shingleWords)
      .select(col("doc_id"), shingles.as("toks"))
      .withColumn("sig", graft.functions.expressions.TextExpressions
        .portable_minhash_sig(col("toks"), numHashes))
  }

  /** Banded candidates + exact-Jaccard verify; see object doc for the
    * exact emitted-pair predicate (band collision AND jaccard).
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 8,
      shingleWords: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = signatures(df, idCol, textCol, numHashes, shingleWords).persist()

    // narrow (doc_id, band_idx, band_key) rows only through the shuffle
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_idx"),
          concat_ws("|", transform(
            slice(col("sig"), b * rows + lit(1), lit(rows)),
            x => x.cast("string"))).as("band_key")))).as("bk"))
      .select(col("doc_id"), col("bk.band_idx").as("band_idx"),
        col("bk.band_key").as("band_key"))

    val candidates = banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("id_b")), Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // the same pair can collide in many bands

    val lookup = sigs.select(col("doc_id"), col("toks"))
    val verified = candidates
      .join(lookup.select(col("doc_id").as("id_a"), col("toks").as("t_a")),
        Seq("id_a"))
      .join(lookup.select(col("doc_id").as("id_b"), col("toks").as("t_b")),
        Seq("id_b"))
      .withColumn("jaccard_sim", TextFunctions.jaccard(col("t_a"), col("t_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard_sim"), 6).as("jaccard_sim"))

    val out = verified.localCheckpoint(true)
    sigs.unpersist()
    out
  }

  /** INCREMENTAL near-dup: a new batch against an existing base —
    * the production ingest shape. Recomputing all-pairs LSH per
    * ingest is O(corpus) per day; the incremental contract is
    * "emit exactly the qualifying pairs that involve at least one
    * NEW document" — base×base pairs are yesterday's output and are
    * structurally excluded from candidate generation (the flag
    * rides the banded rows, so excluded pairs never join, not just
    * never verify).
    *
    * Same signature family, banding, and verify as [[nearDupPairs]];
    * `pair_kind` labels batch_vs_base vs batch_internal. In
    * production the base side's signatures would load from the lake
    * instead of recomputing — the operator takes whatever frames it
    * is given.
    */
  def incrementalNearDupPairs(
      base: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 8,
      shingleWords: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val all = base.select(col(idCol), col(textCol), lit(false).as("_new"))
      .unionByName(
        batch.select(col(idCol), col(textCol), lit(true).as("_new")))
    val flags = all.select(col(idCol).as("doc_id"), col("_new"))
    val sigs = signatures(all, idCol, textCol, numHashes, shingleWords)
      .join(flags, "doc_id").persist()

    val banded = sigs.select(
      col("doc_id"), col("_new"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_idx"),
          concat_ws("|", transform(
            slice(col("sig"), b * rows + lit(1), lit(rows)),
            x => x.cast("string"))).as("band_key")))).as("bk"))
      .select(col("doc_id"), col("_new"),
        col("bk.band_idx").as("band_idx"), col("bk.band_key").as("band_key"))

    val candidates = banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("id_a"), col("_new").as("_new_a"))
      .join(banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("id_b"), col("_new").as("_new_b")),
        Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("_new_a") || col("_new_b")) // base×base never joins on
      .select(col("id_a"), col("id_b"), col("_new_a"), col("_new_b"))
      .distinct()

    val lookup = sigs.select(col("doc_id"), col("toks"))
    val verified = candidates
      .join(lookup.select(col("doc_id").as("id_a"), col("toks").as("t_a")),
        Seq("id_a"))
      .join(lookup.select(col("doc_id").as("id_b"), col("toks").as("t_b")),
        Seq("id_b"))
      .withColumn("jaccard_sim", TextFunctions.jaccard(col("t_a"), col("t_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard_sim"), 6).as("jaccard_sim"),
        when(col("_new_a") && col("_new_b"), "batch_internal")
          .otherwise("batch_vs_base").as("pair_kind"))

    val out = verified.localCheckpoint(true)
    sigs.unpersist()
    out
  }
}
