package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contingency-table association analysis: observed vs expected counts
  * per (rowVar, colVar) cell plus each cell's chi-square contribution —
  * the categorical-drift / independence diagnostic a corpus curator
  * runs before trusting a source×language mix (reference analog: the
  * dashboard terms-donut family, re-expressed as a statistic).
  *
  * Exactness: observed and marginal counts are pure integers;
  * `expected` is the cast-first chain r·c/N and the contribution
  * (o − e)²/e a fixed IEEE op sequence on deterministic inputs,
  * rounded to 6 dp so a DECIMAL sum downstream (`sum(contrib)` = the
  * chi-square statistic) is order-independent.
  *
  * Scale shape: one map-side-combinable cell aggregate; marginals are
  * grouped re-aggregations OF THE CELL FRAME (cardinality = distinct
  * cells, tiny), broadcast back — the raw table is scanned once.
  */
object Contingency {

  def chiSquareCells(df: DataFrame, rowVar: String, colVar: String): DataFrame = {
    val cells = df.groupBy(col(rowVar).as("rv"), col(colVar).as("cv"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("rv")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("cv")).agg(sum(col("o")).as("c"))
    val n = cells.select(sum(col("o")).as("n_total"))
    // all-double chain (cast-first: a long r·c product would overflow
    // at 100 TB counts; doubles are exact below 2^53 and the chain is
    // deterministic IEEE either way)
    val e = col("r").cast("double") * col("c").cast("double") /
      col("n_total").cast("double")
    cells
      .join(broadcast(rows), Seq("rv"))
      .join(broadcast(cols), Seq("cv"))
      .crossJoin(broadcast(n))
      .select(col("rv"), col("cv"), col("o"), col("r"), col("c"),
        col("n_total"),
        e.as("expected"),
        round((col("o") - e) * (col("o") - e) / e, 6).as("contrib"))
  }
}
