package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DistMatchScriptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distribution match: over-represented source bins get thinned") {
    // source: 900 bin-0 rows, 100 bin-1; target: balanced 50/50 —
    // bin 1 is the tightest (keeps all), bin 0 keeps ~1/9
    val source = ((1L to 900L).map(i => (i, 0L)) ++
      (901L to 1000L).map(i => (i, 1L))).toDF("doc_id", "b")
    val target = ((1L to 50L).map(i => (i, 0L)) ++
      (51L to 100L).map(i => (i, 1L))).toDF("doc_id", "b")
    val kept = Sampling.distributionMatch(source, target, "doc_id", col("b"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    val byBin = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byBin(1L) === 100, s"tightest bin keeps everything: $byBin")
    assert(byBin(0L) > 50 && byBin(0L) < 150,
      s"bin 0 thinned to ≈ 1/9 of 900: $byBin")
    // the accepted shares now approximate the target's 50/50
    val frac0 = byBin(0L).toDouble / (byBin(0L) + byBin(1L))
    assert(frac0 > 0.35 && frac0 < 0.65, s"matched distribution: $frac0")
  }

  test("distribution match: zero-target bins reject everything") {
    val source = ((1L to 10L).map(i => (i, 0L)) ++
      (11L to 20L).map(i => (i, 1L))).toDF("doc_id", "b")
    val target = (1L to 10L).map(i => (i, 0L)).toDF("doc_id", "b")
    val kept = Sampling.distributionMatch(source, target, "doc_id", col("b"))
      .collect().map(_.getLong(1))
    assert(kept.forall(_ == 0L), "bin 1 has no target mass")
    assert(kept.length === 10, "bin 0 is the max-ratio bin: keeps all")
  }

  test("script mix: latin, han, and mixed docs classified") {
    val df = Seq(
      (1L, "pure latin text here"),
      (2L, "纯中文文本在此处出现了"),
      (3L, "mixed text with 中文字符内容 inside it"),
      (4L, "12345 !!! ???") // no letters at all
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.scriptMix(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(5),
        r.getAs[Boolean]("is_mixed_script"))).sortBy(_._1)
    assert(out(0) === ((1L, "latin", false)))
    assert(out(1) === ((2L, "han", false)))
    assert(out(2)._2 === "latin")
    assert(out(2)._3, s"CJK-inside-latin must flag: ${out(2)}")
    assert(out(3) === ((4L, "other", false)))
  }
}
