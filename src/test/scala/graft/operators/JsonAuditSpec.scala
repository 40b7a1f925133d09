package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSON sidecar schema-conformance audit. */
class JsonAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every corruption class lands in exactly its counter") {
    val rows = Seq(
      ("a", 1L, "en", """{"id":1,"lang":"en","toks":42}"""), // conformant
      ("a", 2L, "en", """{"id":2,"lang":"en","toks":42"""),  // malformed
      ("a", 3L, "en", """{"id":3,"lang":"en"}"""),           // missing toks
      ("a", 4L, "en", """{"id":4,"lang":"en","toks":"x"}"""), // non-numeric
      ("a", 5L, "en", """{"id":6,"lang":"en","toks":7}""")   // id drift
    ).toDF("src", "id", "lang", "j")
    val out = JsonAudit.schemaConformance(rows, "src", "j",
      requiredFields = Seq("id", "lang", "toks"),
      numericFields = Seq("toks"),
      matchChecks = Seq(("id", "id", col("id").cast("string")),
        ("lang", "lang", col("lang")))).collect()(0)
    assert(out.getLong(1) === 5L)  // n_docs
    assert(out.getLong(2) === 4L)  // n_parsed — malformed is NOT
    // recovered by the lazy parser (the guard premise)
    assert(out.getLong(3) === 4L)  // n_id_present
    assert(out.getLong(4) === 4L)  // n_lang_present
    assert(out.getLong(5) === 3L)  // n_toks_present
    assert(out.getLong(6) === 2L)  // n_toks_numeric
    assert(out.getLong(7) === 3L)  // n_id_match (drift row fails)
    assert(out.getLong(8) === 4L)  // n_lang_match
    assert(out.getLong(9) === 1L)  // n_conformant
    assert(out.getDouble(10) === 0.8)
    assert(out.getDouble(11) === 0.2)
  }
}
