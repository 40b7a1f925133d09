package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChatStructureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conv(id: Long, turns: (String, String)*) =
    (id, turns.map { case (r, c) => Msg(r, c) })

  test("turn stats: role ledger, alternation, ending, token masking") {
    val df = Seq(
      conv(1L, "system" -> "be brief",
        "user" -> "what is two plus two",
        "assistant" -> "four"),
      conv(2L, "user" -> "hi there", "user" -> "hello again",
        "assistant" -> "hi"),                  // broken alternation
      conv(3L, "user" -> "question with five words here"), // trails user
      conv(4L)                                 // empty conversation
    ).toDF("doc_id", "messages")
    val out = ChatStructure.turnStats(df, "doc_id", "messages")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) null else r.getDouble(7),
        r.getBoolean(8), r.getBoolean(9)))).toMap
    // 1: sys(2 tok) + user(5) + assistant(1); frac 1/8
    assert(out(1L) === ((3L, 1L, 1L, 1L, 1L, 5L, 0.125, true, true)))
    // 2: user,user,assistant — alternation broken
    assert(out(2L) === ((3L, 0L, 2L, 1L, 1L, 4L, 0.2, false, true)))
    // 3: lone user turn alternates vacuously but ends wrong
    assert(out(3L) === ((1L, 0L, 1L, 0L, 0L, 5L, 0.0, true, false)))
    // 4: empty — null frac, vacuous alternation, no assistant ending
    assert(out(4L) === ((0L, 0L, 0L, 0L, 0L, 0L, null, true, false)))
  }
}

case class Msg(role: String, content: String)
