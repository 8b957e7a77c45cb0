package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers — the multi-dimensional clustering key
  * behind data-skipping layouts: sorting/bucketing by the bit-interleaved
  * key keeps BOTH dimensions' min/max extents tight within every file or
  * bucket, so a scan with a predicate on either dimension can prune.
  * The interleave is a pure shift/mask expression chain (whole-stage
  * codegen'd, no UDF); at write time pair it with `repartitionByRange` /
  * `sortWithinPartitions` on the z-value.
  */
object ZOrder {

  /** Interleave the low `bitsPerDim` bits of `x` (even positions) and `y`
    * (odd positions) into a `2·bitsPerDim`-bit Morton code. Inputs must be
    * non-negative longs already reduced to the grid (`pmod`/`%` the raw
    * values first).
    */
  def interleave(x: Column, y: Column, bitsPerDim: Int): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31,
      s"bitsPerDim must be in [1, 31], got $bitsPerDim")
    (0 until bitsPerDim).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }
}
