package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy string) join with length-band pruning.
  *
  * `|len(a) - len(b)| > d ⇒ levenshtein(a, b) > d`, so strings bucket
  * by `len div (d+1)` and any qualifying pair differs by at most one
  * bucket: the join runs as an EQUI join on (bucket), with the right
  * side replicated into its bucket ± 1, and only length-compatible
  * candidates reach the O(len·len) levenshtein verify — the same
  * bucket-replicate shape as [[RangeJoin]], applied to string length
  * instead of time. Without this the planner executes a nested-loop
  * join and runs the DP matrix on every cross pair.
  *
  * Further pruning (q-gram count filters, prefix filtering per the
  * string-similarity-join literature) can stack on top by extending
  * the candidate predicate; length banding alone already bounds the
  * blow-up to 3× replication.
  */
object FuzzyJoin {

  /** All (left, right) pairs with `levenshtein(leftCol, rightCol) <=
    * maxDist`. Column names of the two sides must be disjoint.
    */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val width = maxDist + 1
    val l = left.withColumn("_b", expr(s"length($leftCol) div $width"))
    val r = right.withColumn("_b0", expr(s"length($rightCol) div $width"))
      .withColumn("_b", explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    l.join(r, Seq("_b"))
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      .filter(levenshtein(col(leftCol), col(rightCol)) <= maxDist)
      .drop("_b")
  }
}
