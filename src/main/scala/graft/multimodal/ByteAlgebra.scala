package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared byte-extraction column algebra for the header parsers
  * ([[AudioHeaders]], [[VideoHeaders]]): unsigned byte loads via
  * `substr → hex → conv` (each an existing codegen'd expression),
  * endian polynomials over those byte values, and the exact-lattice
  * duration arithmetic — all pure integer math that any engine
  * reproduces bit-for-bit.
  */
private[multimodal] object ByteAlgebra {

  /** Unsigned byte value at 1-based offset `pos` (column or literal). */
  def u8(bin: Column, pos: Column): Column =
    conv(hex(bin.substr(pos, lit(1))), 16, 10).cast("long")
  def u8(bin: Column, pos: Int): Column = u8(bin, lit(pos))

  /** Little-endian u16/u32 at 1-based offset. */
  def le16(bin: Column, pos: Column): Column =
    u8(bin, pos) + u8(bin, pos + lit(1)) * 256L
  def le32(bin: Column, pos: Column): Column =
    u8(bin, pos) + u8(bin, pos + lit(1)) * 256L +
      u8(bin, pos + lit(2)) * 65536L + u8(bin, pos + lit(3)) * 16777216L

  /** Big-endian u16 at 1-based offset (JPEG segment lengths/dims). */
  def be16(bin: Column, pos: Column): Column =
    u8(bin, pos) * 256L + u8(bin, pos + lit(1))

  /** Big-endian u32/u64 at 1-based offset (ISO-BMFF is big-endian). */
  def be32(bin: Column, pos: Column): Column =
    u8(bin, pos) * 16777216L + u8(bin, pos + lit(1)) * 65536L +
      u8(bin, pos + lit(2)) * 256L + u8(bin, pos + lit(3))
  def be64(bin: Column, pos: Column): Column =
    be32(bin, pos) * 4294967296L + be32(bin, pos + lit(4))

  /** Exact floor division of non-negative longs (both engines agree:
    * truncating and floor division coincide on non-negatives, and the
    * numerator is made exactly divisible first so the double division
    * is exact).
    */
  def divFloor(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** 6-dp duration as EXACT integer arithmetic: half-up on the 1e-6
    * lattice via `(2·n·10⁶ + rate) div (2·rate)`, then ONE int→double
    * conversion and ONE division by 10⁶ — both single IEEE ops any
    * engine performs identically. A plain `round(n/rate, 6)` lands on
    * .0000005 boundaries where Spark's BigDecimal HALF_UP and
    * DuckDB's multiply-based round flip the last digit (n = 260477 at
    * 16 kHz is exactly 16.2798125 s).
    */
  def dur6(n: Column, rate: Column): Column =
    divFloor(n * 2000000L + rate, rate * 2L).cast("double") / 1000000.0
}
