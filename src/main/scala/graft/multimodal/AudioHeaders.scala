package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Audio container-header parsing as PURE COLUMN ALGEBRA over binary
  * payloads — the audio analog of [[Multimodal.parseImageDims]], but
  * expressed as Catalyst expressions instead of JVM byte loops so it
  * codegens, prunes, and needs no mapPartitions stage: a metadata
  * pass over 100 TB of audio reads each payload's first ~60 bytes
  * (parquet pages of a `payload` column prefix when stats allow) and
  * never deserializes samples.
  *
  * Two container formats, both computable from public header layouts
  * with nothing but byte extraction and integer arithmetic:
  *
  *  - WAV/RIFF: "RIFF" + riff_size(LE32) + "WAVE", then the "fmt "
  *    chunk (PCM layout: format/channels LE16, sample_rate/byte_rate
  *    LE32, block_align/bits LE16), then the "data" chunk — with ONE
  *    bounded skip over a non-"data" chunk (LIST/INFO metadata is the
  *    common case; deeper chunk stacks return nulls rather than
  *    misparse). n_samples = data_size div block_align.
  *  - FLAC: "fLaC" magic, then the mandatory-first STREAMINFO block:
  *    sample rate (20 bits), channels−1 (3 bits), bits-per-sample−1
  *    (5 bits) and total samples (36 bits) bit-packed in bytes 18-25
  *    (0-based) — unpacked here with shift-free div/mod arithmetic on
  *    per-byte values so every step is exact integer math in any
  *    engine.
  *
  * Byte access is `substr(payload, pos, 1)` → `hex` → `conv(_,16,10)`
  * — each an existing codegen'd expression; multi-byte fields are
  * little/big-endian polynomials over those byte values. Duration is
  * half-up integer division on the 1e-6 lattice (see [[dur6]]), so
  * the whole parse hash-checks cross-engine (q260).
  */
object AudioHeaders {

  import ByteAlgebra.{u8, le16, le32, divFloor, dur6}

  private val WavMagic = "52494646"  // "RIFF"
  private val WaveId = "57415645"    // "WAVE"
  private val DataId = "64617461"    // "data"
  private val FlacMagic = "664C6143" // "fLaC" (hex() is uppercase)

  /** Parse a WAV (RIFF/PCM) header: struct(sample_rate, channels,
    * bits_per_sample, n_samples, duration_s) — nulls when the payload
    * is not a canonical RIFF/WAVE with "fmt " at offset 12 and "data"
    * found directly or after one metadata chunk.
    */
  def parseWav(payload: Column): Column = {
    val isRiff = hex(payload.substr(lit(1), lit(4))) === WavMagic &&
      hex(payload.substr(lit(9), lit(4))) === WaveId &&
      hex(payload.substr(lit(13), lit(4))) === "666D7420" // "fmt "
    val channels = le16(payload, lit(23))
    val rate = le32(payload, lit(25))
    val blockAlign = le16(payload, lit(33))
    val bits = le16(payload, lit(35))
    // chunk walk: first chunk after fmt is at 1-based 37; skip ONE
    // non-"data" chunk (8-byte header + its size), else give up
    val c0 = lit(37L)
    val c1 = c0 + lit(8L) + le32(payload, c0 + lit(4L))
    val dataOff = when(hex(payload.substr(c0, lit(4))) === DataId, c0)
      .when(hex(payload.substr(c1, lit(4))) === DataId, c1)
    val dataSize = le32(payload, dataOff + lit(4L))
    val nSamples = divFloor(dataSize, blockAlign)
    when(isRiff && dataOff.isNotNull && blockAlign > 0L && rate > 0L,
      struct(
        rate.as("sample_rate"),
        channels.as("channels"),
        bits.as("bits_per_sample"),
        nSamples.as("n_samples"),
        dur6(nSamples, rate).as("duration_s")))
  }

  /** Parse a FLAC STREAMINFO header (the spec-mandated first metadata
    * block): struct(sample_rate, channels, bits_per_sample, n_samples,
    * duration_s) — nulls when the magic is absent or the first block
    * is not STREAMINFO.
    */
  def parseFlac(payload: Column): Column = {
    val isFlac = hex(payload.substr(lit(1), lit(4))) === FlacMagic &&
      // block header: 1 bit last-flag + 7 bit type, type 0 = STREAMINFO
      pmod(u8(payload, 5), lit(128L)) === 0L
    // bit-packed bytes, 0-based 18..25 → 1-based 19..26
    val b18 = u8(payload, 19); val b19 = u8(payload, 20)
    val b20 = u8(payload, 21); val b21 = u8(payload, 22)
    val b22 = u8(payload, 23); val b23 = u8(payload, 24)
    val b24 = u8(payload, 25); val b25 = u8(payload, 26)
    val rate = b18 * 4096L + b19 * 16L + divFloor(b20, lit(16L))
    val channels = divFloor(pmod(b20, lit(16L)), lit(2L)) + 1L
    val bits = pmod(b20, lit(2L)) * 16L + divFloor(b21, lit(16L)) + 1L
    val nSamples = pmod(b21, lit(16L)) * 4294967296L +
      b22 * 16777216L + b23 * 65536L + b24 * 256L + b25
    when(isFlac && rate > 0L,
      struct(
        rate.as("sample_rate"),
        channels.as("channels"),
        bits.as("bits_per_sample"),
        nSamples.as("n_samples"),
        dur6(nSamples, rate).as("duration_s")))
  }

  /** Magic-dispatched parse: struct(container, sample_rate, channels,
    * bits_per_sample, n_samples, duration_s); container null when the
    * payload is neither.
    */
  def parseAudio(payload: Column): Column = {
    val wav = parseWav(payload)
    val flac = parseFlac(payload)
    val container = when(wav.isNotNull, "wav")
      .when(flac.isNotNull, "flac")
    val best = coalesce(wav, flac)
    struct(
      container.as("container"),
      best.getField("sample_rate").as("sample_rate"),
      best.getField("channels").as("channels"),
      best.getField("bits_per_sample").as("bits_per_sample"),
      best.getField("n_samples").as("n_samples"),
      best.getField("duration_s").as("duration_s"))
  }
}
