package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection with Importance Resampling (Xie et al.
  * 2023): score every raw document by how target-like its hashed
  * n-gram profile is. The importance log-weight of a document is
  *
  *   log w(doc) = Σ_b c_doc[b] · ( ln p_target[b] − ln p_raw[b] )
  *
  * over a FIXED hashed feature space of B buckets (unigrams hashed
  * by md5 here; the hashing is what makes the model size corpus-
  * independent), with add-one smoothing so every bucket has mass in
  * both distributions. Raw = the whole corpus, target = the rows
  * matching `targetPred` — the classic setup "select web documents
  * that look like Wikipedia".
  *
  * Exactness: both ln terms land on the q187 ln-lattice (round to
  * 1e-8 as a long) ONCE PER BUCKET, so a document's weight is an
  * integer dot product  Σ c_doc[b] · Δlattice[b]  — exact int64
  * arithmetic, order-free, and bit-reproducible in any engine. The
  * magnitude bound: |Δ| ≤ ln(N) · 1e8 ≈ 2·10⁹ lattice units and
  * Σ c_doc ≤ doc length, so a 10⁸-token document stays < 2·10¹⁷,
  * inside int64.
  *
  * Scale shape: one token explode folded straight into a (bucket,
  * is_target) partial-count aggregate — the model is B rows TOTAL
  * (256 here) independent of corpus size, and rides a broadcast join
  * back onto per-document bucket counts. No global windows, no
  * driver math beyond nothing: even the corpus totals stay inside
  * the B-row frame via a window over 256 rows.
  */
object Dsir {

  /** Per-document importance log-weights against a target slice.
    * Returns (id, n_tokens, log_weight 6-dp). Empty-token documents
    * get weight 0 (they match every distribution equally).
    */
  def importanceLogWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"bucket count out of range: $buckets")
    val toksOf = df.select(col(idCol), targetPred.as("_is_t"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("_term"))
      .select(col(idCol), col("_is_t"),
        (conv(substring(md5(col("_term")), 1, 15), 16, 10).cast("long")
          % buckets).as("_b"))

    // the hashed-unigram model: B rows, built in one aggregate
    val counts = toksOf.groupBy(col("_b"))
      .agg(sum(when(col("_is_t"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cr"))
    // complete the bucket domain (unseen buckets still carry smoothed
    // mass) and totals via a window over the B-row frame — no collect
    val spark = df.sparkSession
    val domain = spark.range(0, buckets).select(col("id").as("_b"))
    val full = domain.join(counts, Seq("_b"), "left")
      .select(col("_b"), coalesce(col("_ct"), lit(0L)).as("_ct"),
        coalesce(col("_cr"), lit(0L)).as("_cr"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val lattice = full
      .withColumn("_nt", sum(col("_ct")).over(wAll))
      .withColumn("_nr", sum(col("_cr")).over(wAll))
      .select(col("_b"),
        (round(log((col("_ct") + 1L).cast("double")
            / (col("_nt") + buckets).cast("double")) * 1e8).cast("long")
          - round(log((col("_cr") + 1L).cast("double")
            / (col("_nr") + buckets).cast("double")) * 1e8).cast("long"))
          .as("_dl"))

    val docBuckets = toksOf.groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val weights = docBuckets.join(broadcast(lattice), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).cast("long").as("n_tokens"),
        sum(col("_c") * col("_dl")).as("_lw"))
    df.select(col(idCol)).join(weights, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("_lw"), lit(0L)).cast("double") / 1e8, 6)
          .as("log_weight"))
  }
}
