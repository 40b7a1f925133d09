package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PSI must equal an independent plain-Scala replay of the lattice
  * definition, and must actually rank drift: a dimension whose cohort
  * distributions differ scores far above one where they match.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dim 0: cohort A centered low, cohort B centered high (drift);
  // dim 1: both cohorts identical (stable)
  private val rows: Seq[(Long, Boolean, Seq[Float])] =
    (0 until 40).map { i =>
      val a = i % 2 == 0
      val d0 = if (a) -0.5f + (i % 5) * 0.01f else 0.4f + (i % 5) * 0.01f
      val d1 = 0.1f + (i % 5) * 0.01f
      (i.toLong, a, Seq(d0, d1))
    }

  private val Lo = -0.8
  private val W = 0.2
  private val NB = 8

  private def reference(): Map[Int, Double] = {
    val dims = rows.head._3.indices
    val ta = rows.count(_._2)
    val tb = rows.size - ta
    dims.map { d =>
      val binsOf = (cohort: Boolean) => rows.filter(_._2 == cohort)
        .map { r =>
          math.min(math.max(
            math.floor((r._3(d).toDouble - Lo) / W).toInt, 0), NB - 1)
        }
      val na = binsOf(true).groupBy(identity).view.mapValues(_.size).toMap
      val nb = binsOf(false).groupBy(identity).view.mapValues(_.size).toMap
      val terms = (0 until NB).map { b =>
        val pa = (na.getOrElse(b, 0) + 1).toDouble / (ta + NB).toDouble
        val pb = (nb.getOrElse(b, 0) + 1).toDouble / (tb + NB).toDouble
        math.round((pa - pb) * 1e8) * math.round(math.log(pa / pb) * 1e8)
      }
      d -> BigDecimal(terms.sum.toDouble / 1e16)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("psi equals the independent lattice replay and ranks drift") {
    val df = rows.toDF("vec_id", "is_a", "embedding")
    val got = Drift.psiByDimension(df, "vec_id", "embedding", "is_a")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == reference())
    assert(got(0) > 0.25, s"shifted dim should alarm: ${got(0)}")
    assert(got(1) < 0.1, s"stable dim should stay quiet: ${got(1)}")
  }

  test("cohort counts are reported per dimension") {
    val df = rows.toDF("vec_id", "is_a", "embedding")
    Drift.psiByDimension(df, "vec_id", "embedding", "is_a")
      .collect().foreach { r =>
        assert(r.getLong(2) == 20L && r.getLong(3) == 20L)
      }
  }

  test("KS two-sample: exact D on a hand CDF, zero on identical " +
      "groups, one row per unordered pair") {
    import spark.implicits._
    // g1 = 1..4, g2 = 3..6: D = 0.5 (at v=2..4), d_num = 8 over 16
    // g3 duplicates g1 exactly -> D(g1, g3) = 0
    val df = ((1L to 4L).map("a" -> _) ++ (3L to 6L).map("b" -> _) ++
      (1L to 4L).map("c" -> _)).toDF("g", "v")
    val got = KsTest.ksTwoSample(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b")) ===
      ((4L, 4L, 8L, 0.5, math.sqrt(16.0 / 8.0) * 0.5)))
    assert(got(("a", "c"))._3 === 0L && got(("a", "c"))._4 === 0.0)
    assert(got(("b", "c"))._4 === 0.5)
  }
}
