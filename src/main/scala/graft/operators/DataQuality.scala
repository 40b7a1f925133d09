package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ pattern): a
  * rule set is compiled into ONE aggregate pass over the table and
  * comes back as a tiny (column, constraint, violations, passed)
  * frame. At 100 TB the validation cost is the cost of one scan — all
  * constraints share it; nothing is collected and no per-rule jobs are
  * launched.
  *
  * [[Unique]] is the only rule that needs a distinct aggregate; mixing
  * it with plain sums makes Catalyst plan a single-scan Expand (one
  * extra shuffle of (key, gid) rows — the standard multi-distinct
  * plan, still one pass over the data). Rule sets without [[Unique]]
  * stay a pure map-side-combine aggregate.
  *
  * Null semantics, mirrored exactly by the SQL oracle: [[NotNull]]
  * counts nulls; [[InRange]]/[[IsIn]] do NOT count nulls as
  * violations (a range rule on a nullable column composes with an
  * explicit [[NotNull]] rule instead of double-counting); [[Unique]]
  * counts rows minus distinct non-null values, so every null row
  * beyond the count of distinct values reads as a duplicate.
  */
object DataQuality {

  sealed trait Constraint {
    def column: String
    def name: String
    /** Aggregate expression counting violating rows. */
    def violations: Column
  }

  final case class NotNull(column: String) extends Constraint {
    val name = "not_null"
    def violations: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  final case class Unique(column: String) extends Constraint {
    val name = "unique"
    def violations: Column = count(lit(1)) - count_distinct(col(column))
  }

  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    val name = "in_range"
    def violations: Column =
      sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L))
  }

  final case class IsIn(column: String, values: Seq[String]) extends Constraint {
    val name = "is_in"
    def violations: Column =
      sum(when(!col(column).isin(values: _*), 1L).otherwise(0L))
  }

  /** Runs every constraint in one aggregate pass; output is one row
    * per constraint: (column_name, constraint_name, violations,
    * passed), violations as double for cross-engine schema stability.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations.cast("double"), lit(0.0)).as(s"_v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val items = constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(c.column).as("column_name"), lit(c.name).as("constraint_name"),
        col(s"_v$i").as("violations"), (col(s"_v$i") === 0.0).as("passed"))
    }
    one.select(explode(array(items: _*)).as("r")).select(col("r.*"))
  }

  /** Functional-dependency audit (the discovery-tool primitive, à la
    * Metanome): for each candidate LHS → RHS pair, how many LHS
    * values map to MORE THAN ONE distinct RHS — zero means the
    * dependency holds exactly. One (lhs)-keyed count-distinct
    * aggregate per pair (different grouping keys can't share a
    * pass); each collapses the table to |distinct lhs| rows before
    * the violation count, which is itself a one-row aggregate.
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "no dependency pairs given")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("_l"))
        .agg(countDistinct(col(rhs)).as("_nr"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("_nr") > 1L, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_violating"),
          (col("n_violating") === 0L).as("fd_holds"))
    }.reduce(_ unionByName _)
  }

  /** Foreign-key orphan audit: child rows whose key has no match in
    * the parent's key set — the referential-integrity check a lake
    * runs before publishing a join-dependent table. One distinct
    * collapse of each side and one left-anti-shaped aggregate; the
    * parent key set arrives as a join, never a collect.
    */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("_k")).distinct()
      .withColumn("_present", lit(1))
    child.select(col(childKey).as("_k"))
      .join(pk, Seq("_k"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        sum(when(col("_present").isNull, 1L).otherwise(0L))
          .as("n_orphan_rows"),
        countDistinct(when(col("_present").isNull, col("_k")))
          .as("n_orphan_keys"))
      .select(lit(childKey).as("child_key"), lit(parentKey).as("parent_key"),
        col("n_child_rows"), col("n_orphan_rows"), col("n_orphan_keys"),
        (col("n_orphan_rows") === 0L).as("integrity_holds"))
  }
}
