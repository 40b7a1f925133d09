package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Dunning's log-likelihood ratio G² (Dunning 1993) over the same
    * document-presence pair pipeline as [[pmiPairs]] — the
    * collocation significance test that, unlike PMI, does not blow
    * up on rare pairs. With the 2×2 presence table
    * (k11 = c_ab, k12 = c_a − c_ab, k21 = c_b − c_ab,
    * k22 = N − c_a − c_b + c_ab),
    *
    *   G² = 2 · Σ_cells k · ln( k·N / (row·col) ),   0·ln(·) = 0
    *
    * Each cell's ln lands on the 1e-8 lattice once; the four
    * k·lattice products accumulate in DECIMAL(38,0) (k·|ln|·10⁸
    * overflows int64 at 100-TB document counts), and one division
    * by 1e8 closes the chain — hash-checkable end to end.
    */
  def llrPairs(docs: DataFrame, idCol: String, tokCol: String,
      dfTimes: Int = 10, pairTimes: Int = 25): DataFrame = {
    val base = pmiPairs(docs, idCol, tokCol, dfTimes, pairTimes)
    val n = docs.select(countDistinct(col(idCol)).as("_n"))
    val dec = "decimal(38,0)"
    def term(k: Column, row: Column, colm: Column): Column = {
      val lat = round(log((k.cast("double") * col("_n").cast("double"))
        / (row.cast("double") * colm.cast("double"))) * 1e8).cast("long")
      when(k > 0, k.cast(dec) * lat.cast(dec)).otherwise(lit(0).cast(dec))
    }
    val k11 = col("c_ab")
    val k12 = col("c_a") - col("c_ab")
    val k21 = col("c_b") - col("c_ab")
    val k22 = col("_n") - col("c_a") - col("c_b") + col("c_ab")
    val row2 = col("_n") - col("c_a")
    val col2 = col("_n") - col("c_b")
    // pinned 4-term order: k11 + k12 + k21 + k22 (exact decimal adds)
    val g2lat = term(k11, col("c_a"), col("c_b"))
      .plus(term(k12, col("c_a"), col2))
      .plus(term(k21, row2, col("c_b")))
      .plus(term(k22, row2, col2))
    base.crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        round(lit(2.0) * (g2lat.cast("double") / 1e8), 6).as("g2"))
  }
}
