package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReferentialAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fd audit: held and violated dependencies, nulls as values") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),  // key 1: single a, single x
      (2L, "b", "x"), (2L, "b", "y"),  // key 2: single b, TWO x/y
      (3L, "c", "z")
    ).toDF("k", "v1", "v2")
    val out = DataQuality.fdAudit(df, Seq("k" -> "v1", "k" -> "v2"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(out(0) === (("v1", 3L, 0L, true)))
    assert(out(1) === (("v2", 3L, 1L, false)))
  }

  test("fk orphans: counts rows and distinct keys separately") {
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val r = DataQuality.fkOrphans(child, "k", parent, "k").collect()(0)
    assert(r.getLong(2) === 6L)  // child rows
    assert(r.getLong(3) === 3L)  // orphan rows (the three 9s)
    assert(r.getLong(4) === 1L)  // orphan keys
    assert(!r.getBoolean(5))
  }

  test("fk orphans: full coverage reports integrity") {
    val child = Seq(1L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val r = DataQuality.fkOrphans(child, "k", parent, "k").collect()(0)
    assert(r.getLong(3) === 0L && r.getBoolean(5))
  }
}
