package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge statistics — the inner loop of tokenizer
  * training: for the character-level initial vocabulary, count every
  * adjacent symbol pair across the corpus, weighted by occurrence
  * (the highest-count pair is BPE's next merge).
  *
  * Scale shape — the reason this is an operator and not a one-liner:
  * pairs are counted over the WORD-FREQUENCY TABLE, not the raw
  * corpus. The first aggregate collapses the corpus to its
  * vocabulary (|vocab| ≪ corpus size, and it stops growing — Heaps'
  * law), so the pair expansion (×|word| per row) runs over a bounded
  * frame no matter how many documents stream through the first
  * shuffle. Two hash-keyed exchanges total, both map-side-combined.
  */
object BpePairs {

  /** (left_sym, right_sym, n): total weighted count of each adjacent
    * character pair over whitespace-tokenized, lowercased words;
    * pairs with n < `minCount` are dropped (BPE never merges rare
    * pairs; the threshold keeps the result table bounded).
    */
  def pairCounts(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2) // 1-char words have no pairs
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    words
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1)," +
        " i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("f")).as("n"))
      .filter(col("n") >= minCount)
  }

  // Symbol-boundary markers for the merge loop's string encoding:
  // control characters that cannot occur in whitespace-split corpus
  // tokens, so `<sym>` wrapping is unambiguous.
  private val O = "\u0001" // opens a symbol
  private val C = "\u0002" // closes a symbol

  /** The full BPE TRAINING loop (Sennrich et al. 2016) — `rounds`
    * iterations of: count adjacent symbol pairs over the word-
    * frequency table, take the single most frequent pair (tie-break
    * pinned: count desc, then left, then right, lexicographic), fuse
    * every non-overlapping occurrence left-to-right, repeat on the
    * re-symbolized vocabulary. Output is the learned merge table —
    * (round, left_sym, right_sym, pair_count) — the artifact a
    * tokenizer trainer actually ships.
    *
    * Greedy left-to-right non-overlapping fusion is encoded WITHOUT a
    * per-row loop: each word is kept as a marker-wrapped symbol
    * string (`⟨sym⟩⟨sym⟩…` with control-character brackets), and one
    * `replace(word, ⟨l⟩⟨r⟩, ⟨lr⟩)` per round IS the BPE merge — SQL
    * `replace` scans left to right and resumes after each
    * replacement, which is exactly the non-overlap rule ("aaaa" with
    * merge (a,a) → "aa","aa"; "aaa" → "aa","a"), and the closed
    * brackets make cross-symbol false matches (("ba","a") matching
    * pattern "a·a") impossible. Identical semantics in DuckDB's
    * `replace`, so the whole R-round fixed point hash-checks against
    * an unrolled-CTE oracle (q261).
    *
    * Scale shape: like [[pairCounts]], everything after the first
    * aggregate runs over the VOCABULARY (Heaps-bounded), not the
    * corpus. Each round is one map-side-combined pair aggregate, one
    * 1-row `min(struct)` argmax (no global sort), and one broadcast
    * cross join of that single row for the rewrite; rounds are
    * localCheckpoint-pinned so the R-round chain stays R linear
    * passes (the q113 re-inlining lesson). No driver collect — the
    * winning pair never leaves the cluster.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int): DataFrame =
    // a round whose pair set was empty (vocabulary fully merged
    // before `rounds` rounds) carries a NULL argmax row — drop it,
    // matching the oracle's LIMIT 1 over an empty CTE emitting nothing
    mergeRounds(docs, textCol, rounds).reduce(_ union _)
      .filter(col("left_sym").isNotNull)

  /** The per-round 1-row merge frames (round, left_sym, right_sym,
    * pair_count), checkpointed — [[learnMerges]] unions them;
    * [[encodeTokenCounts]] replays them over the corpus.
    */
  private def mergeRounds(
      docs: DataFrame,
      textCol: String,
      rounds: Int): Seq[DataFrame] = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    // vocabulary with frequencies, each word as ⟨c⟩⟨c⟩… symbol string
    var words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(regexp_replace(col("w"), "(.)", O + "$1" + C).as("w"), col("f"))
      .localCheckpoint()

    val merged = (1 to rounds).map { r =>
      // adjacent pairs over the current symbolization, weighted by f
      val pairs = words
        .select(col("f"), split(
          expr("substring(w, 2, length(w) - 2)"), C + O).as("s"))
        // a fully-merged single-symbol word has no pairs — and Spark's
        // sequence(1, 0) is DESCENDING [1, 0], not empty, so without
        // this guard element_at(s, 0) throws (DuckDB's range(1, 1) is
        // empty and skips these rows naturally)
        .filter(size(col("s")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("n"))
      // argmax with pinned tie-break, as a 1-row aggregate (map-side
      // combinable min(struct) — no global sort)
      val top = pairs
        .agg(min(struct((-col("n")).as("nn"),
          col("l").as("l"), col("r").as("r"))).as("_b"))
        .select(col("_b.l").as("l"), col("_b.r").as("r"),
          (-col("_b.nn")).as("n"))
        .localCheckpoint()
      // fuse every non-overlapping ⟨l⟩⟨r⟩ left to right; when the
      // round was degenerate (empty pair set → NULL argmax row) the
      // coalesce to chr(3) — a marker that never occurs inside a
      // symbol string — turns the replace into a no-op instead of
      // null-poisoning the whole words frame
      words = words.crossJoin(broadcast(top))
        .select(expr(
          "replace(w, concat(chr(1), coalesce(l, chr(3)), chr(2)," +
            " chr(1), coalesce(r, chr(3)), chr(2))," +
            " concat(chr(1), coalesce(l, chr(3)), coalesce(r, chr(3))," +
            " chr(2)))").as("w"), col("f"))
        .localCheckpoint()
      top.select(lit(r).as("round"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("n").as("pair_count"))
    }
    merged
  }

  /** APPLY the learned tokenizer: re-derive the `rounds` merges, then
    * encode every document by replaying them over the marker-wrapped
    * text and count the resulting tokens — the "how many tokens is
    * this corpus under our tokenizer" pass every training-data budget
    * starts from, plus the chars-per-token compression ratio (the
    * fertility-style quality signal for the learned vocab).
    *
    * Encoding wraps every NON-SPACE character of the lowercased text
    * (`regexp_replace(lower(text), (\S), ⟨$1⟩)`), so whitespace
    * remains between wrapped symbols and a merge pattern ⟨l⟩⟨r⟩ can
    * never span a word boundary — the training-side word split is
    * enforced structurally, with no per-word explode. Each merge
    * arrives as a broadcast 1-row frame (no driver collect) and is
    * one corpus-wide replace(); token count = the closing-marker
    * count (one ⟨sym⟩ per token). Scale shape: R linear string
    * passes over the corpus, zero shuffles beyond the training
    * aggregates themselves.
    */
  def encodeTokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): DataFrame = {
    val tops = mergeRounds(docs, textCol, rounds)
    var cur = docs.select(col(idCol),
      regexp_replace(lower(col(textCol)), "(\\S)", O + "$1" + C).as("_w"),
      length(regexp_replace(col(textCol), "\\s", "")).cast("long")
        .as("n_chars"))
    tops.zipWithIndex.foreach { case (top, i) =>
      cur = cur
        .crossJoin(broadcast(top.select(
          col("left_sym").as(s"_l$i"), col("right_sym").as(s"_r$i"))))
        // same degenerate-round guard as the training loop: a NULL
        // merge row must be a no-op on the corpus, not a null poison
        .withColumn("_w", expr(
          s"replace(_w, concat(chr(1), coalesce(_l$i, chr(3)), chr(2)," +
            s" chr(1), coalesce(_r$i, chr(3)), chr(2))," +
            s" concat(chr(1), coalesce(_l$i, chr(3))," +
            s" coalesce(_r$i, chr(3)), chr(2)))"))
        .drop(s"_l$i", s"_r$i")
    }
    cur.select(col(idCol),
        expr("length(_w) - length(replace(_w, chr(2), ''))").cast("long")
          .as("n_tokens_bpe"),
        col("n_chars"))
      .withColumn("chars_per_token",
        when(col("n_tokens_bpe") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_chars").cast("double")
            / col("n_tokens_bpe").cast("double"), 6)))
  }
}
