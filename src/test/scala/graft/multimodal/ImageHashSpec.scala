package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gradientImg(w: Int, h: Int,
      f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("monotone gradient hashes to all-ones; reverse to all-zeros") {
    assert(ImageHash.dHash(gradientImg(9, 8, (x, _) => x * 20)) ===
      "ffffffffffffffff")
    assert(ImageHash.dHash(gradientImg(9, 8, (x, _) => 255 - x * 20)) ===
      "0000000000000000")
  }

  test("2x downsample (18x16) equals the native 9x8 hash") {
    val f = (x: Int, y: Int) => (x * 37 + y * 11) % 256
    val native = ImageHash.dHash(gradientImg(9, 8, f))
    // nearest sample at floor(i*18/9) = 2i, floor(j*16/8) = 2j
    val up = ImageHash.dHash(gradientImg(18, 16,
      (x, y) => f(x / 2, y / 2)))
    assert(native === up)
  }

  test("dHashDf: re-encoded (PNG) image hashes identically; junk is null") {
    val img = gradientImg(9, 8, (x, y) => (x * 53 + y * 29) % 256)
    val direct = ImageHash.dHash(img)
    val rows = Seq((1L, png(img)), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = ImageHash.dHashDf(rows, "id", "payload")
      .select("id", "dhash").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some(direct)) // checksum ledger would MISS this
    assert(out(2L) === None)
  }

  test("hammingPairs: a 1-bit nudge pairs up; distinct images do not") {
    val f = (x: Int, y: Int) => (x * 91 + y * 57) % 256
    val a = gradientImg(9, 8, f)
    // flip one comparison: raise pixel (3, 2) just above its left
    // neighbor's value if it wasn't, or keep the delta tiny
    val b = gradientImg(9, 8, (x, y) =>
      if (x == 3 && y == 2) (f(x, y) + 9) % 256 else f(x, y))
    val c = gradientImg(9, 8, (x, y) => (x * 17 + y * 131 + 7) % 256)
    val hashes = ImageHash.dHashDf(
      Seq((1L, png(a)), (2L, png(b)), (3L, png(c))).toDF("id", "payload"),
      "id", "payload")
    val pairs = ImageHash.hammingPairs(hashes, "id", "dhash", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length === 1, s"pairs: ${pairs.toSeq}")
    assert(pairs(0)._1 === 1L && pairs(0)._2 === 2L)
    assert(pairs(0)._3 <= 2L)
  }

  test("hammingHex counts exact bit differences") {
    val d = Seq(("ffffffffffffffff", "fffffffffffffffe"),
        ("0000000000000000", "00000000000000ff"),
        ("abcdef0123456789", "abcdef0123456789"))
      .toDF("h1", "h2")
      .select(ImageHash.hammingHex("h1", "h2").as("d"))
      .collect().map(_.getInt(0))
    assert(d.toSeq === Seq(1, 8, 0))
  }
}
