package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for LLM-scale corpora (SURVEY.md §7.5):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every near-dup variant is
  * shingle/sign → bucket → *bucket-equi-join* → verify — the candidate
  * join always shuffles on a bucket key (never a cross join), so the
  * plan survives a 100× scale-up; bucket skew is handled by AQE skew
  * join. All hashing is seeded/constant → runs are deterministic.
  */
object Dedup {

  // ── Exact ───────────────────────────────────────────────────────────

  /** Exact dedup on a column set: keeps the row with the smallest
    * `idCol` per duplicate group (deterministic, unlike
    * `dropDuplicates` whose survivor is partition-order dependent).
    */
  def exactKeepMinId(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(_ == idCol)
    df.groupBy(keyCols.map(col).toSeq: _*)
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_copies"))
  }

  /** Content hash groups: sha-256 of the text with group sizes —
    * the classic "exact near-zero-cost first pass" before any fuzzy
    * matching. Hash-groupBy shuffles only (hash, id) pairs.
    */
  def exactHashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("text_sha"))
      .groupBy(col("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ── MinHash + LSH ───────────────────────────────────────────────────

  /** Large Mersenne-ish prime for the universal-hash family. */
  private val P = 4294967311L // smallest prime > 2^32
  private def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (P - 1) + 1,
      math.abs(rnd.nextLong()) % P))
  }

  /** MinHash signature (array<long> of length `numHashes`) over a
    * shingle array: min over shingles of (a·x + b) mod P per hash,
    * x = xxhash64(shingle) folded to 32 bits. Empty shingle set → all
    * `P` (sentinel, never collides with a real signature).
    */
  def minHashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val sigs = hashParams(numHashes, seed).map { case (a, b) =>
      coalesce(
        array_min(transform(shingles,
          s => pmod(pmod(xxhash64(s), lit(P)) * lit(a) + lit(b), lit(P)))),
        lit(P))
    }
    array(sigs: _*)
  }

  /** Banded LSH candidate pairs + exact-Jaccard verification.
    *
    * @param threshold minimum true Jaccard over `shingleWords`-gram sets
    * @return (id_a, id_b, jaccard_sim) with id_a < id_b, one row per pair
    */
  def minHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val prepared = df.select(
      col(idCol).as("doc_id"),
      wordShingles(col(textCol), shingleWords).as("shingles"))
      .withColumn("sig", minHashSignature(col("shingles"), numHashes))

    // one row per (doc, band): band key = hash of the signature slice
    val banded = prepared.select(
      col("doc_id"), col("shingles"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_idx"),
            xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows))).as("band_hash")))
      ).as("band"))
      .select(col("doc_id"), col("shingles"),
        col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))

    val left = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val right = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_b"), col("shingles").as("sh_b"))

    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b") // same pair can collide in many bands
      .withColumn("jaccard_sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_sim"), 6).as("jaccard_sim"))
  }

  // ── SimHash ─────────────────────────────────────────────────────────

  /** Hamming distance between two 64-bit signatures. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: signature → `bands` chunks of 64/bands
    * bits as join keys → verify by Hamming distance ≤ maxHamming.
    */
  def simHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 4,
      maxHamming: Int = 6): DataFrame = {
    val bitsPerBand = 64 / bands
    val prepared = df.select(col(idCol).as("doc_id"),
      simHash64(tokens(lower(col(textCol)))).as("sig"))

    val banded = prepared.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band_idx"),
          shiftright(col("sig"), j * bitsPerBand)
            .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("band_key"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("sig"),
        col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))

    val left = banded.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val right = banded.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))

    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDist(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 64-bit SimHash built by statically unrolling the 64 bit positions
    * (shift amounts must be literals in Spark's shift functions).
    */
  def simHash64(tokensCol: Column): Column = {
    val hashes = transform(tokensCol, t => xxhash64(t))
    // vote(b) > 0 → bit b set; fold bits most-significant-first:
    // acc*2 + bit
    (63 to 0 by -1).foldLeft(lit(0L)) { (acc, b) =>
      val vote = aggregate(hashes, lit(0L), (a, h) =>
        a + when(shiftright(h, b).bitwiseAND(lit(1L)) =!= 0, 1L).otherwise(-1L))
      acc * 2 + when(vote > 0, 1L).otherwise(0L)
    }
  }

  // ── n-gram Jaccard (bucketed, no LSH) ───────────────────────────────

  /** Character-n-gram Jaccard near-dup pairs with cheap blocking: docs
    * are bucketed by (length band, first shingle hash band) to bound the
    * pairwise comparison; exact Jaccard verifies. Suited to short-doc
    * corpora; MinHash is the scale path for long docs.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4,
      threshold: Double = 0.7,
      lengthBandWidth: Int = 16): DataFrame = {
    val prepared = df.select(col(idCol).as("doc_id"),
      charShingles(col(textCol), n).as("shingles"),
      floor(length(col(textCol)) / lengthBandWidth).as("len_band"))

    // docs within Jaccard t of each other have length ratio ≥ t → only
    // adjacent length bands can match; explode each doc into its own
    // and next band so the equi-join covers both.
    val blocked = prepared.select(col("doc_id"), col("shingles"),
      explode(array(col("len_band"), col("len_band") + 1)).as("block"))

    val left = blocked.select(col("block"), col("doc_id").as("id_a"),
      col("shingles").as("sh_a"))
    val right = blocked.select(col("block"), col("doc_id").as("id_b"),
      col("shingles").as("sh_b"))

    left.join(right, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard_sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_sim"), 6).as("jaccard_sim"))
  }

  // ── Embedding cosine near-dup ───────────────────────────────────────

  /** Deterministic random hyperplanes for sign-LSH. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding near-dup: sign-LSH bucket join + exact cosine verify.
    * Multi-probe: each vector lands in its bucket and all 1-bit-flip
    * neighbors, trading bandwidth for recall.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      numPlanes: Int = 12,
      seed: Long = 42L): DataFrame = {
    val planes = randomPlanes(numPlanes, dim, seed)
    val prepared = df.select(col(idCol).as("vec_id_"), col(vecCol).as("vec"))
      .withColumn("bucket0", VectorFunctions.lshBucket(col("vec"), planes))
    // probe buckets: own + 1-bit flips
    val probes = explode(array(
      (col("bucket0") +: (0 until numPlanes).map(i =>
        col("bucket0").bitwiseXOR(lit(1L << i)))): _*)).as("bucket")
    val blocked = prepared.select(col("vec_id_"), col("vec"), probes)

    val left = blocked.select(col("bucket"), col("vec_id_").as("id_a"),
      col("vec").as("vec_a"))
    val right = blocked.select(col("bucket"), col("vec_id_").as("id_b"),
      col("vec").as("vec_b"))

    left.join(right, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine_sim", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"))
  }
}
