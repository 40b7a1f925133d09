package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JPEG header parsing as PURE COLUMN ALGEBRA — the JFIF companion
  * to [[AudioHeaders]]/[[VideoHeaders]]: JPEG is the dominant web
  * image format, and a 100-TB catalog pass wants dimensions, bit
  * depth, component count and the baseline/progressive split from
  * the first ~200 bytes without ever entropy-decoding a scan.
  *
  * ITU-T T.81 layout: the stream is `FFD8` (SOI) followed by marker
  * segments, each `FF` + marker byte + BE16 length (the length
  * counts itself but not the marker). The frame geometry lives in
  * the first SOFn segment: precision(1) height(BE16) width(BE16)
  * n_components(1). APPn/COM/DQT/DHT segments of arbitrary length
  * precede it, so the parse is a bounded marker-hop walk — exactly
  * the [[VideoHeaders]] box walk with T.81's length convention.
  * Deeper prefixes than the hop bound return nulls rather than
  * misparse (real catalogs would raise the constant).
  *
  * Byte access is the shared [[ByteAlgebra]] (`substr → hex → conv`
  * big-endian polynomials) — pure integer math, zero shuffle,
  * hash-checkable cross-engine (q290).
  */
object ImageHeaders {

  import ByteAlgebra.{be16, u8}

  /** SOFn marker byte → frame-coding label. SOF0 baseline and SOF2
    * progressive dominate the public web; SOF1 (extended sequential)
    * is kept because it shares the exact payload layout.
    */
  private val SofLabels: Seq[(Long, String)] =
    Seq(0xC0L -> "baseline", 0xC1L -> "extended", 0xC2L -> "progressive")

  /** Parse a JPEG header: struct(sof_marker, precision, height,
    * width, n_components, n_pixels) — nulls when the payload is not
    * SOI-led or no SOFn appears within `maxHops` marker segments.
    */
  def parseJpeg(payload: Column, maxHops: Int = 5): Column = {
    require(maxHops >= 1 && maxHops <= 16, s"unreasonable hops: $maxHops")
    val isSoi = u8(payload, lit(1L)) === 0xFFL &&
      u8(payload, lit(2L)) === 0xD8L
    // hop offsets: segment at pos is FF <marker> <BE16 len>; the
    // next starts at pos + 2 + len
    val offsets = Iterator.iterate(lit(3L): Column)(pos =>
      pos + lit(2L) + be16(payload, pos + lit(2L)))
      .take(maxHops).toSeq
    def markerAt(pos: Column): Column =
      when(u8(payload, pos) === 0xFFL, u8(payload, pos + lit(1L)))
    val sofValues = SofLabels.map(_._1)
    // first hop whose marker is a SOFn; CaseWhen evaluates in order
    val sofOff = offsets.foldLeft(lit(null).cast("long"): Column)(
      (acc, pos) => coalesce(acc,
        when(markerAt(pos).isin(sofValues: _*), pos)))
    val sofMarker = markerAt(sofOff)
    val label = SofLabels.foldLeft(lit(null).cast("string"): Column) {
      case (acc, (m, name)) =>
        coalesce(acc, when(sofMarker === m, lit(name)))
    }
    val precision = u8(payload, sofOff + lit(4L))
    val height = be16(payload, sofOff + lit(5L))
    val width = be16(payload, sofOff + lit(7L))
    val nComp = u8(payload, sofOff + lit(9L))
    when(isSoi && sofOff.isNotNull,
      struct(
        label.as("sof_marker"),
        precision.as("precision"),
        height.as("height"),
        width.as("width"),
        nComp.as("n_components"),
        (height * width).as("n_pixels")))
  }
}
