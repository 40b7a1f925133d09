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

  test("loss mask: assistant tokens surviving front-truncation") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq(
      // turns: user 10, assistant 20 [10,30), user 5, assistant 15
      // [35,50); L=25 → kept = (25−10) + 0 = 15 of 35 trainable
      conv(1L, "user" -> words(10), "assistant" -> words(20),
        "user" -> words(5), "assistant" -> words(15)),
      // fits entirely: kept = trainable
      conv(2L, "user" -> words(3), "assistant" -> words(4)),
      // nothing trainable → null kept_frac
      conv(3L, "user" -> words(30))
    ).toDF("doc_id", "messages")
    val out = ChatStructure.lossMask(df, "doc_id", "messages", 25L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        r.getBoolean(6)))).toMap
    assert(out(1L) === ((50L, 35L, 15L, 20L, 15.0 / 35.0, false)))
    assert(out(2L) === ((7L, 4L, 4L, 0L, 1.0, true)))
    assert(out(3L) === ((30L, 0L, 0L, 0L, null, false)))
  }
}

case class Msg(role: String, content: String)
