package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of two dimension keys gives a 1-D sort order in which rows
  * close in EITHER dimension land close on disk, so min/max file
  * statistics prune scans filtered on either column (a plain sort
  * clusters only its leading column).
  *
  * The interleave is the classic magic-number bit spread — five
  * shift-or-mask steps per dimension, all codegen'd integer ops, no
  * UDF. To lay out a table: `df.repartitionByRange(n, zkey)` +
  * `sortWithinPartitions(zkey)` + write — at 100 TB the layout job is
  * one range shuffle, and every later two-sided filter reads a tiny
  * fraction of files.
  *
  * Dimension inputs must be non-negative; x < 2^32 and y < 2^31 keep
  * the signed key non-negative (y's top bit would land in bit 63). A
  * production pipeline first rank-encodes arbitrary values into dense
  * non-negative ints — e.g. quantile bucket ids from [[OrderStats]] —
  * so the envelope is never binding.
  */
object ZOrder {

  private val spreads: Seq[(Int, Long)] = Seq(
    16 -> 0x0000ffff0000ffffL,
    8 -> 0x00ff00ff00ff00ffL,
    4 -> 0x0f0f0f0f0f0f0f0fL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the 32 low bits of `v` to the even bit positions of a
    * 64-bit long: b_i → bit 2i.
    */
  def spreadBits(v: Column): Column =
    spreads.foldLeft(v.cast("long").bitwiseAND(lit(0xffffffffL))) {
      case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }

  /** 64-bit Morton key: x in the even bits, y in the odd bits. */
  def zkey(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Coarse z-cell id: the top bits of the key — each cell is an
    * axis-aligned square of side 2^(cellBits/2) in (x, y) space, the
    * unit a z-ordered file layout prunes at.
    */
  def zcell(x: Column, y: Column, cellBits: Int): Column =
    shiftright(zkey(x, y), cellBits)

  /** DuckDB twins (same shifts and masks; `&`/`|`/`<<` on BIGINT). */
  object Sql {
    def spreadBits(v: String): String =
      spreads.foldLeft(s"(CAST($v AS BIGINT) & ${0xffffffffL})") {
        case (acc, (sh, mask)) => s"((($acc | ($acc << $sh)) & $mask))"
      }
    def zkey(x: String, y: String): String =
      s"(${spreadBits(x)} | (${spreadBits(y)} << 1))"
    def zcell(x: String, y: String, cellBits: Int): String =
      s"(${zkey(x, y)} >> $cellBits)"
  }
}
