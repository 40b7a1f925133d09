package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CDC change-log fold + PPS systematic sampling. */
class CdcPpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def changes = Seq(
    // (key, ts, id, type, value)
    ("a", 10L, 1L, "set", 1.0), ("a", 20L, 2L, "set", 2.0),
    ("b", 10L, 3L, "set", 3.0), ("b", 20L, 4L, "del", 0.0),
    ("c", 10L, 5L, "del", 0.0), ("c", 20L, 6L, "set", 6.0),
    // same ts: event id 8 wins
    ("d", 10L, 7L, "set", 7.0), ("d", 10L, 8L, "set", 8.0)
  ).toDF("k", "ts", "id", "op", "value")

  test("cdc: last writer wins, deletes drop the key, ids break ts ties") {
    val got = Cdc.applyChangeLog(changes, Seq("k"), Seq("ts", "id"),
        Seq("op", "value"), isDelete = $"op" === "del")
      .as[(String, String, Double, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got == Map(
      "a" -> ((2.0, 2L)),   // latest upsert, 2 changes folded
      "c" -> ((6.0, 2L)),   // delete then re-insert -> present
      "d" -> ((8.0, 2L))))  // same ts, higher id wins
    // b's final change is a delete -> absent entirely
  }

  test("cdc: aggregate form, not a window (no per-key sort at scale)") {
    val plan = Cdc.applyChangeLog(changes, Seq("k"), Seq("ts", "id"),
      Seq("op", "value"), isDelete = $"op" === "del")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window node:\n$plan")
  }

  test("pps: matches an independent reference walk; exactly k picks") {
    val rows = (1L to 40L).map(i => (i, i)) // w=id, W=820 >= k^2 for k=20
    val df = rows.toDF("id", "wt")
    val got = Sampling.ppsSystematicSample(df, "id", "wt", k = 20)
      .as[(Long, Long, Long)].collect().map(r => (r._1, (r._2, r._3))).toMap

    // reference: same md5 order, plain Scala prefix walk
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ordered = rows.sortBy { case (id, _) => (md5hex(id + ":pps_v1"), id) }
    val total = rows.map(_._2).sum
    val step = total / 20
    var cum = 0L
    val expect = ordered.flatMap { case (id, w) =>
      val lo = cum; cum += w
      val m = cum / step - lo / step
      if (m > 0) Some(id -> ((w, m))) else None
    }.toMap
    assert(got == expect)
    assert(got.values.map(_._2).sum == 20L)
  }

  test("pps: heavy rows are certainty inclusions with multiplicity") {
    // one row carries half the mass: with k=10 it must appear >= 4 times
    val df = ((1L to 20L).map(i => (i, 5L)) :+ (99L, 100L)).toDF("id", "wt")
    val got = Sampling.ppsSystematicSample(df, "id", "wt", k = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(99L) >= 4L)
    assert(got.values.sum == 10L)
  }

  test("pps: total weight below k fails fast instead of returning empty") {
    // totalW = 3 < k = 5 -> stride would be 0; must raise, not
    // silently select nothing
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "wt")
    val e = intercept[Exception] {
      Sampling.ppsSystematicSample(df, "id", "wt", k = 5).collect()
    }
    assert(e.getMessage.contains("total weight")
      || Option(e.getCause).exists(_.getMessage.contains("total weight")))
  }
}
