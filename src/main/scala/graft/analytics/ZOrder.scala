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
  * distinct cells, far past file-level pruning resolution; widen to
  * 3×21-bit dimensions with the same masks if ever needed. */
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
}
