package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence statistics with a PMI-style association score —
  * the building block for collocation mining, phrase detection and
  * topic seeding over a training corpus (word2vec-era SGNS shifts, ACL
  * collocation literature; reference analog: the terms-agg dashboard
  * family, `dags/sky_safe_dag.py` usage rollups).
  *
  * Semantics: a document "contains" a token if it appears at least
  * once (presence, not frequency). For every unordered token pair
  * (a < b lexicographically) whose co-occurrence doc count satisfies
  * `c_ab · pairTimes ≥ N` — both tokens individually satisfying
  * `df · dfTimes ≥ N` — emit the exact document counts and the PMI
  * core ratio `P(a,b)/(P(a)P(b)) = c_ab·N / (c_a·c_b)`.
  *
  * Exactness: thresholds are integer cross-multiplications (no float
  * fractions), every count is an integer, and the only float op is
  * ONE IEEE-754 division of two exactly-converted BIGINT products —
  * deterministic and engine-portable (no log/exp; callers take `log`
  * downstream where drift doesn't face an oracle). Counts below 2⁵³
  * convert to double losslessly.
  *
  * Scale shape: thresholds are corpus-RELATIVE (df ≥ N/dfTimes), so
  * the frequent vocabulary stays O(dfTimes/Zipf) — a few hundred
  * tokens — at ANY corpus size; it is broadcast to prune the per-doc
  * token lists BEFORE the pair join, bounding the O(k²) per-doc pair
  * explosion by frequent-tokens-per-doc, not document length. The
  * pair count is one shuffle keyed by doc then (tok_a, tok_b);
  * per-token counts ride the same broadcast back onto the result. No
  * driver materialization.
  */
object Cooccurrence {

  /** @param docs frame with (`idCol`, `tokCol`: array<string>) —
    *             pre-tokenized documents.
    * @param dfTimes   keep tokens with df·dfTimes ≥ N (df ≥ N/dfTimes)
    * @param pairTimes keep pairs with c_ab·pairTimes ≥ N
    */
  def pmiPairs(docs: DataFrame, idCol: String, tokCol: String,
      dfTimes: Int = 10, pairTimes: Int = 25): DataFrame = {
    // presence: one row per (doc, distinct token)
    val toks = docs
      .select(col(idCol).as("_doc"),
        explode(array_distinct(col(tokCol))).as("tok"))
    val n = toks.select(countDistinct(col("_doc")).as("n_docs"))
    // per-token document frequency; the corpus-relative df slice is
    // the broadcastable frequent vocabulary (Zipf-bounded)
    val dfreq = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * dfTimes >= col("n_docs"))
    // prune to frequent tokens before pairing (bounds the explosion)
    val kept = toks.join(broadcast(dfreq.select("tok")), Seq("tok"))
      .select(col("_doc"), col("tok"))
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a._doc") === col("b._doc") &&
        col("a.tok") < col("b.tok"))
      .select(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(dfreq.select(col("tok").as("tok_a"), col("df").as("c_a"))),
        Seq("tok_a"))
      .join(broadcast(dfreq.select(col("tok").as("tok_b"), col("df").as("c_b"))),
        Seq("tok_b"))
      .crossJoin(broadcast(n))
      .filter(col("c_ab") * pairTimes >= col("n_docs"))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab") * col("n_docs")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("pmi_ratio"))
  }
}
