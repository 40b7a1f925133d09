package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ImageHeadersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val app0 = "ffe0" + "0010" + "4a46494600" + "0101" + "00" +
    "0048" + "0048" + "0000"
  private def sof(marker: String, h: Int, w: Int, nc: Int): String =
    marker + f"${8 + 3 * nc}%04x" + "08" + f"$h%04x" + f"$w%04x" +
      f"$nc%02x" + "001100" * nc

  private def parse(hex: String) = {
    val df = Seq(Tuple1(hexBytes(hex))).toDF("b")
    ImageHeaders.withJpeg(df, "b", "j").select("j.*").collect().head
  }

  test("baseline SOF0 directly after APP0") {
    val r = parse("ffd8" + app0 + sof("ffc0", 480, 640, 3))
    assert(r.getString(0) === "baseline")
    assert(r.getLong(1) === 8L) // precision
    assert(r.getLong(2) === 480L && r.getLong(3) === 640L)
    assert(r.getLong(4) === 3L)
    assert(r.getLong(5) === 480L * 640L)
  }

  test("progressive SOF2 behind COM and DQT hops, grayscale") {
    val com = "fffe" + "0005" + "414141" // 3 payload bytes
    val dqt = "ffdb" + "0043" + "00" * 65
    val r = parse("ffd8" + app0 + com + dqt + sof("ffc2", 4000, 8, 1))
    assert(r.getString(0) === "progressive")
    assert(r.getLong(2) === 4000L && r.getLong(3) === 8L)
    assert(r.getLong(4) === 1L)
  }

  test("non-JPEG and SOF-beyond-hop-bound both return null") {
    val notJpeg = Seq(Tuple1(hexBytes("89504e470d0a1a0a")),
      // SOI but 6 segments before the SOF — past the 5-hop bound
      Tuple1(hexBytes("ffd8" + ("fffe" + "0004" + "4141") * 6 +
        sof("ffc0", 16, 16, 1))))
      .toDF("b")
    val out = ImageHeaders.withJpeg(notJpeg, "b", "j")
      .select("j").collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
