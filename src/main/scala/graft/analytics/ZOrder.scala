package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-LAYOUT
  * operator behind multi-column data skipping (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, re-expressed engine-native): interleaving the bits of two
  * dimension keys gives a 1-D sort order in which points close in BOTH
  * dimensions land close in the order, so range-partitioned files get
  * tight per-file min/max ranges on BOTH columns and scans filtered on
  * either dimension prune most files. A plain two-column sort only
  * prunes the leading column.
  *
  * The z-value is pure integer bit math (the standard magic-mask spread,
  * e.g. Hacker's Delight §7-2) on the low 16 bits of each dimension —
  * a codegen'd Column expression chain, no UDF, engine-portable (the
  * oracle runs the same shifts in DuckDB and must agree exactly).
  *
  * Scale: computing `zval` is a per-row projection at scan speed;
  * [[zOrderLayout]] adds ONE range shuffle (`repartitionByRange` samples
  * the z-distribution to pick balanced bounds) and a per-partition sort
  * — exactly the cost of a normal sorted write, with the multi-dim
  * pruning benefit on every later read. 16 bits per dimension = 4G
  * distinct cells (two dims), 21 bits per dimension (three dims,
  * [[zValue3]]/[[zOrderLayoutN]]) — both far past file-level pruning
  * resolution. */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30). */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two non-negative dimension keys (low 16 bits
    * each): a's bits land at even positions, b's at odd. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Annotate with `zval` and cluster the frame by it: range-partition on
    * the z-curve, sort within partitions — every output file covers a
    * compact z-range, i.e. a small rectangle in (a, b) space. */
  def zOrderLayout(df: DataFrame, a: String, b: String,
      numPartitions: Int = 32): DataFrame =
    df.withColumn("zval", zValue(col(a), col(b)))
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")

  /** Spread the low 21 bits of `c` to every THIRD bit position (0,3,…,60)
    * — the 3-D Morton masks (same magic-mask family as [[spread16]];
    * 3 × 21 = 63 bits fits a long with the sign bit clear). */
  def spread21(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0x1FFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Morton interleave of THREE non-negative dimension keys (low 21 bits
    * each): a's bits at positions ≡ 0 (mod 3), b's ≡ 1, c's ≡ 2. */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spread21(a)
      .bitwiseOR(shiftleft(spread21(b), 1))
      .bitwiseOR(shiftleft(spread21(c), 2))

  /** [[zOrderLayout]] for two OR three dimension columns: the layout
    * behind `OPTIMIZE ZORDER BY (a, b[, c])`. Two dims use the 16-bit
    * interleave (4G cells), three the 21-bit one (2⁶³ cells) — both far
    * past file-level pruning resolution. More than three dims dilute
    * per-dimension locality faster than they help (each extra dimension
    * costs every other one interleave resolution); Delta's guidance caps
    * ZORDER columns for the same reason, and so does this. */
  def zOrderLayoutN(df: DataFrame, cols: Seq[String],
      numPartitions: Int = 32): DataFrame = {
    val z = cols match {
      case Seq(a, b) => zValue(col(a), col(b))
      case Seq(a, b, c) => zValue3(col(a), col(b), col(c))
      case _ => throw new IllegalArgumentException(
        s"zOrderLayoutN takes 2 or 3 columns, got ${cols.size}")
    }
    df.withColumn("zval", z)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")
  }
}
