package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON sidecar schema-conformance audit — the intake gate for the
  * metadata lines that ride alongside every crawled/annotated corpus
  * (one JSON object per document: ids, language tags, token counts).
  * Reports, per group: parse rate, per-field presence, numeric-type
  * conformance, expected-value agreement, and the all-checks-pass
  * conformance rate.
  *
  * Cross-engine contract: extraction is GUARDED by the whole-document
  * parse check on BOTH engines (Spark's lazy `get_json_object` can
  * recover field prefixes from truncated JSON where DuckDB's
  * `json_extract_string` errors — guarding makes malformed docs
  * contribute nothing on either side), numeric conformance is the
  * portable `^[0-9]+$`, and every rate is one division of exact
  * counts.
  *
  * Scale shape: a zero-shuffle projection (parse + field extraction
  * fuse into the scan) followed by one map-side-combinable aggregate
  * per group — no windows, no joins.
  */
object JsonAudit {

  /** @param requiredFields fields that must be present
    * @param numericFields  fields that must match `^[0-9]+$`
    * @param matchChecks    (fieldPath, checkName, expectedColumn) —
    *                       extracted string must equal the expected
    *                       column's value
    */
  def schemaConformance(df: DataFrame, groupCol: String,
      jsonCol: String, requiredFields: Seq[String],
      numericFields: Seq[String],
      matchChecks: Seq[(String, String, Column)]): DataFrame = {
    val staged = df.withColumn("_ok",
      get_json_object(col(jsonCol), "$").isNotNull)
    val fields =
      (requiredFields ++ numericFields ++ matchChecks.map(_._1)).distinct
    val withF = fields.foldLeft(staged) { (acc, f) =>
      acc.withColumn("_f_" + f,
        when(col("_ok"), get_json_object(col(jsonCol), "$." + f)))
    }
    def pres(f: String) = col("_f_" + f).isNotNull
    val numOk = numericFields.map(f =>
      f -> (pres(f) && col("_f_" + f).rlike("^[0-9]+$")))
    val matches = matchChecks.map { case (f, name, exp) =>
      name -> (pres(f) && col("_f_" + f) === exp)
    }
    val conform = (Seq(col("_ok")) ++ requiredFields.map(pres) ++
      numOk.map(_._2) ++ matches.map(_._2)).reduce(_ && _)

    def cnt(c: Column, as: String) =
      sum(when(c, 1L).otherwise(0L)).as(as)
    val aggs =
      Seq(count(lit(1)).as("n_docs"), cnt(col("_ok"), "n_parsed")) ++
      requiredFields.map(f => cnt(pres(f), s"n_${f}_present")) ++
      numOk.map { case (f, c) => cnt(c, s"n_${f}_numeric") } ++
      matches.map { case (n, c) => cnt(c, s"n_${n}_match") } :+
      cnt(conform, "n_conformant")
    withF.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .withColumn("parse_rate",
        col("n_parsed").cast("double") / col("n_docs").cast("double"))
      .withColumn("conform_rate",
        col("n_conformant").cast("double") / col("n_docs").cast("double"))
  }
}
