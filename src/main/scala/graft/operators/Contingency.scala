package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Normalized mutual information + purity between two categorical
    * columns — the clustering-agreement readout (cluster vs label,
    * predicted vs gold) chi²/G² don't give: NMI is comparable across
    * cardinalities and corpus sizes.
    *
    * Exactness (the q243 G² discipline): each observed cell
    * contributes n_ab·round(ln(n_ab·N/(n_a·n_b))·10⁸) with the ln
    * argument ONE double division of exact integer products; the
    * marginal entropies accumulate n_a·round(ln(N/n_a)·10⁸) the same
    * way; everything sums in DECIMAL(38,0). The common 1/(N·10⁸)
    * factor CANCELS in
    *
    *   NMI = I_lat / √(Hₐ_lat · H_b_lat)
    *
    * so the headline is one division over one sqrt of one exact
    * product. `purity` = Σ_b max_a n_ab / N is a min-struct per b
    * and one exact division. Constant columns (zero entropy) yield
    * null NMI, never a fabricated value.
    *
    * Scale shape: one (a, b) count aggregate (domain-bounded), two
    * marginal re-aggregates of it, everything after is
    * cell-cardinality work.
    */
  def nmiPurity(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_n"))
      .localCheckpoint()
    val ma = cells.groupBy(col("_a")).agg(sum(col("_n")).as("_na"))
    val mb = cells.groupBy(col("_b")).agg(sum(col("_n")).as("_nb"))
    val tot = cells.agg(sum(col("_n")).as("_nt"),
      count(lit(1)).as("n_cells")).localCheckpoint()

    def lat(num: Column, den: Column): Column =
      round(log(num.cast("double") / den.cast("double")) * 1e8, 0)
        .cast("long")

    val iLat = cells
      .join(broadcast(ma), "_a").join(broadcast(mb), "_b")
      .crossJoin(broadcast(tot))
      .select((col("_n").cast(dec) *
        lat(col("_n").cast(dec) * col("_nt").cast(dec),
          col("_na").cast(dec) * col("_nb").cast(dec)).cast(dec))
        .as("_t"))
      .agg(sum(col("_t")).as("i_lat"))
    def hLat(marg: DataFrame, c: String) = marg.crossJoin(broadcast(tot))
      .select((col(c).cast(dec) * lat(col("_nt"), col(c)).cast(dec))
        .as("_t"))
      .agg(sum(col("_t")).as(c + "_h"))
    val pur = cells.groupBy(col("_b"))
      .agg(max(col("_n")).as("_mx")).agg(sum(col("_mx")).as("_pur"))

    iLat.crossJoin(hLat(ma, "_na")).crossJoin(hLat(mb, "_nb"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(pur))
      .select(col("_nt").as("n_rows"), col("n_cells"),
        (col("i_lat").cast("double") /
          (col("_nt").cast("double") * 1e8)).as("mi"),
        (col("_na_h").cast("double") /
          (col("_nt").cast("double") * 1e8)).as("h_a"),
        (col("_nb_h").cast("double") /
          (col("_nt").cast("double") * 1e8)).as("h_b"),
        when(col("_na_h") > 0 && col("_nb_h") > 0,
          col("i_lat").cast("double") /
            sqrt((col("_na_h") * col("_nb_h")).cast("double")))
          .as("nmi"),
        (col("_pur").cast("double") / col("_nt").cast("double"))
          .as("purity"))
  }
}
