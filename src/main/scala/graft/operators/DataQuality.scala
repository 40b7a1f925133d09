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
}
