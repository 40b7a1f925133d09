package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
  * 2003 — the MOSS document-fingerprinting sketch): hash every token
  * k-gram, slide a window of w consecutive gram hashes over each
  * document, and keep the minimum hash of every window. The selected
  * set is position-local (any shared substring of length ≥ w+k−1
  * yields at least one shared fingerprint — the paper's guarantee)
  * and its density converges to 2/(w+1), so a corpus fingerprints
  * into a small sketch with matching quality no random sample gives.
  *
  * Relational form: positional k-gram hashes (RepeatedSpans' fold —
  * the token array is referenced k times, not once per position),
  * then per document one ordered window computing
  * `min(struct(hash, pos))` over the w-row frame starting at each
  * full-window position — struct min is lexicographic, so ties (a
  * ~2⁻³² md5-prefix event) break to the LEFTMOST position, a pinned
  * convention both engines share. (The paper's "robust winnowing"
  * breaks ties to the RIGHTMOST minimal hash; either rule satisfies
  * the coverage guarantee, and the oracles mirror leftmost, so the
  * sketch is self-consistent but differs from canonical MOSS on hash
  * ties.) DISTINCT over the selected (doc, pos) pairs is the
  * fingerprint set, exactly as defined.
  *
  * Scale shape: the window partition is a document (bounded by
  * document length), the frame is w rows — no corpus-wide sort, no
  * self-join; the postings explode is the only data-volume term and
  * it is linear. Selection itself never leaves the per-doc partition.
  */
object Winnowing {

  /** Fingerprint rows: (doc, fp_pos, fp_hash) — the winnowed sketch.
    * `fp_hash` is the 16-hex md5 prefix of the k-gram at fp_pos.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(w >= 2, s"winnowing window must be >= 2: $w")
    val toks = TextFunctions.tokens(col(textCol))
    val grams = df
      .select(col(idCol), toks.as("_tk"))
      .filter(size(col("_tk")) >= k + w - 1) // at least one full window
      .select(col(idCol),
        posexplode(RepeatedSpans.positionalKGrams(col("_tk"), k)))
      .select(col(idCol), col("pos"),
        substring(md5(col("col")), 1, 16).as("_h"))

    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val frame = byDoc.rowsBetween(Window.currentRow, w - 1)
    val nGrams = Window.partitionBy(col(idCol))
    grams
      .withColumn("_n", count(lit(1)).over(nGrams))
      .withColumn("_win",
        min(struct(col("_h"), col("pos"))).over(frame))
      // only positions that start a FULL w-window select a fingerprint
      .filter(col("pos") <= col("_n") - w)
      .select(col(idCol), col("_win.pos").as("fp_pos"),
        col("_win._h").as("fp_hash"))
      .distinct()
  }

  /** The MOSS matching step: document pairs sharing ≥ `minShared`
    * winnowing fingerprints — the candidate-pair stage a plagiarism/
    * boilerplate detector runs on the sketch instead of the corpus.
    * Fingerprints with document frequency above `dfCap` are dropped
    * from pair GENERATION (the q140 prefix-filter lesson: one
    * stop-word-grade fingerprint shared by n documents would emit
    * n²/2 candidate rows; capped fingerprints bound the join at
    * df²·|fingerprints| with df ≤ dfCap, and a pair sharing only
    * capped fingerprints is boilerplate-of-everything, not a match).
    * Sketch density 2/(w+1) already shrinks the postings ~3× before
    * the join.
    */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Int = 2, dfCap: Int = 50)
      : DataFrame = {
    require(minShared >= 1 && dfCap >= 2,
      s"bad match parameters: minShared=$minShared dfCap=$dfCap")
    val fps = fingerprints(df, idCol, textCol, k, w)
    val shared = fps.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= dfCap)
      .select(col("fp_hash"))
    val posts = fps.join(shared, "fp_hash")
      .select(col("fp_hash"), col(idCol))
    posts.select(col("fp_hash"), col(idCol).as("id_a"))
      .join(posts.select(col("fp_hash"), col(idCol).as("id_b")), Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Sketch accounting per document: gram count, fingerprint count,
    * density (≈ 2/(w+1) for random-ish hashes — the paper's bound).
    */
  def sketchProfile(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_fingerprints"))
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol),
        greatest(size(toks) - (k - 1), lit(0)).cast("long").as("n_grams"))
      .join(fps, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_fingerprints"), lit(0L)).as("n_fingerprints"),
        round(when(col("n_grams") === 0, 0.0)
          .otherwise(coalesce(col("n_fingerprints"), lit(0L)).cast("double")
            / col("n_grams").cast("double")), 6).as("density"))
  }
}
