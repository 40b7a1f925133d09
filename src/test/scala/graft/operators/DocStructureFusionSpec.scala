package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DocStructureFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("doc structure: every counter on a hand-built markdown doc") {
    val md = Seq(
      "## title here",
      "",
      "- first item",
      "  * nested item",
      "1. ordered",
      "```",
      "    x = f(y)",
      "```",
      "plain prose line!",
      "\tindented tab line").mkString("\n")
    val r = DocStructure.stats(Seq((1L, md)).toDF("id", "t"), "id", "t")
      .collect().head
    assert(r.getLong(1) === 10L)  // n_lines
    assert(r.getLong(2) === 1L)   // n_blank
    assert(r.getLong(3) === 1L)   // n_heading
    assert(r.getLong(4) === 3L)   // n_list (-, nested *, 1.)
    assert(r.getLong(5) === 2L)   // fence lines
    assert(r.getLong(6) === 1L)   // code blocks
    assert(r.getLong(7) === 2L)   // indented ("    x = f(y)", tab line)
    assert(r.getLong(8) === 18L)  // "plain prose line!".length + 1? no: longest line
  }

  test("special tokens: repeated markers count by occurrence") {
    val df = Seq(
      ("web", "a <|endoftext|> b <|endoftext|> c"),
      ("web", "clean"),
      ("chat", "<|im_start|>user hi<|im_end|> <s>x</s>")
    ).toDF("source", "t")
    val out = SpecialTokens.audit(df, "source", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("web", "<|endoftext|>")) === ((1L, 2L)))
    assert(out(("chat", "<|im_start|>")) === ((1L, 1L)))
    assert(out(("chat", "<s>")) === ((1L, 1L)))
    assert(out(("chat", "</s>")) === ((1L, 1L)))
    assert(!out.contains(("web", "<s>")))
  }

  test("RRF: lattice reciprocals and the fused order") {
    // item a: ranks (1, 2) -> 1639344 + 1612903 = 3252247
    // item b: ranks (2, 1) -> same total -> tie broken by id: a first
    // item c: ranks (3, 3) -> 2 * 1587302 = 3174604
    val ra = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "r1")
    val rb = Seq(("a", 2L), ("b", 1L), ("c", 3L)).toDF("id", "r2")
    val out = RankFusion.fuse(ra, rb, "id", "r1", "r2")
      .collect().map(r => (r.getString(0),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((3252247L, 1L)))
    assert(out("b") === ((3252247L, 2L)))
    assert(out("c") === ((3174604L, 3L)))
  }

  test("RRF: an id missing from one ranking scores only the other") {
    val ra = Seq(("a", 1L)).toDF("id", "r1")
    val rb = Seq(("a", 1L), ("b", 2L)).toDF("id", "r2")
    val out = RankFusion.fuse(ra, rb, "id", "r1", "r2")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("a") === 2L * 1639344L)
    assert(out("b") === 1612903L)
  }
}
