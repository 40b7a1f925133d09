package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** SimHash near-duplicate detection over a PORTABLE fingerprint: the
  * per-token hash is md5 (bit-identical in every engine) instead of a
  * JVM-private hash, so the whole pipeline — fingerprint, banding,
  * Hamming verify — is expressible in ANSI-ish SQL and can be
  * hash-checked against an external oracle end to end. The engine's
  * fast path ([[Dedup.simHashNearDupPairs]], xxhash-based compiled
  * kernel) keeps the same shape; this variant trades a little kernel
  * speed for cross-engine verifiability of the EXACT operator output,
  * not just its verify stage.
  *
  * Fingerprint definition (60 bits, p = 0..59):
  *   - tokens: lowercase, whitespace split, empties dropped, DISTINCT
  *     (the dedup family's convention, weight 1 per distinct token)
  *   - token bit p = bit `3 - p%4` of the nibble at hex digit `p/4`
  *     of md5(token) — i.e. the first 15 hex digits read MSB-first
  *   - s_p = Σ_tokens (2·bit − 1); fingerprint bit p = 1 iff s_p > 0
  *     (the s_p = 0 tie is 0 — integer-exact, no float anywhere)
  *   - fp = Σ_p bit_p · 2^p, a non-negative long < 2^60
  *
  * Scale shape: identical to the xxhash SimHash — one narrow pass
  * computes (id, fp); candidates come from an equi-join on
  * `nBands` fingerprint bands (Hamming ≤ maxHamming < nBands forces
  * band equality somewhere, so banding is LOSSLESS by pigeonhole);
  * the verify re-joins only the candidate ids. Nothing quadratic, no
  * shuffle carries payloads — only (id, fp) and (band, key) rows.
  */
object PortableSimHash {

  val Bits = 60
  private val HexDigits = Bits / 4 // 15 hex digits = 60 bits

  /** (idCol → doc_id, fp): the portable 60-bit fingerprint. Docs with
    * zero tokens are dropped (no fingerprint is defined for them —
    * and the SQL mirror's unnest produces no rows for them either).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one md5 per distinct token, reused across all 60 bit positions
    val hexes = transform(
      array_distinct(TextFunctions.tokens(lower(col(textCol)))),
      t => md5(t))
    // bit p of one token hash h (values ≤ 15 — the floor/pow detour is
    // integer-exact and mirrors 1:1 into SQL engines without bitops on
    // column-valued shifts)
    def tokenBit(h: Column, p: Column): Column = {
      val nib = conv(h.substr((floor(p / 4) + 1).cast("int"), lit(1)), 16, 10)
        .cast("int")
      pmod(floor(nib / pow(lit(2.0), lit(3) - pmod(p, lit(4)))).cast("long"), lit(2L))
    }
    val bits = transform(
      sequence(lit(0), lit(Bits - 1)),
      p => when(
        aggregate(col("_hexes"), lit(0L),
          (acc, h) => acc + tokenBit(h, p) * 2L - 1L) > 0, 1L).otherwise(0L))
    // fold MSB-first: acc·2 + bit ≡ Σ bit_p·2^p, pure long arithmetic
    val fp = aggregate(reverse(col("_bits")), lit(0L), (acc, b) => acc * 2 + b)
    df.select(col(idCol).as("doc_id"), hexes.as("_hexes"))
      .filter(size(col("_hexes")) > 0)
      .withColumn("_bits", bits)
      .select(col("doc_id"), fp.as("fp"))
  }

  /** Near-dup pairs (id_a < id_b, hamming ≤ maxHamming) via banded
    * candidates + exact Hamming verify. Lossless: `maxHamming <
    * nBands` means any qualifying pair agrees on at least one whole
    * band (pigeonhole), so the band equi-join cannot miss it.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      nBands: Int = 4): DataFrame = {
    require(Bits % nBands == 0, s"nBands must divide $Bits")
    require(maxHamming < nBands,
      s"losslessness needs maxHamming ($maxHamming) < nBands ($nBands)")
    val bandBits = Bits / nBands
    val mask = (1L << bandBits) - 1
    val fps = fingerprints(df, idCol, textCol).persist()
    val banded = fps.select(col("doc_id"), explode(array(
      (0 until nBands).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("fp"), b * bandBits)
          .bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val verified = candidates
      .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
    val out = verified.localCheckpoint(true)
    fps.unpersist()
    out
  }
}
