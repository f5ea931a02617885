package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve values for multi-column clustering — the
 * Delta `OPTIMIZE ZORDER BY` / space-filling-curve role. A linear
 * `clusterBy(a, b)` sort gives perfect file pruning on `a` and none on
 * `b`; interleaving the bits of both coordinates places rows so that
 * every file covers a small HYPERCUBE of the value space — min/max
 * stats then prune files for predicates on ANY clustered column.
 *
 * Everything here composes codegen'd builtins (floor/shiftright/
 * bitwiseAND/shiftleft — no UDF): the z-value of k columns at `bits`
 * resolution is a single LONG column, so the clustering sort is an
 * ordinary range-partition + sort on one key.
 */
object ZOrder {

  /** Max bits such that k columns fit one long. */
  def bitsFor(k: Int): Int = math.min(16, 63 / k)

  /** Scale a numeric column onto the [0, 2^bits) integer grid given
   *  its global [lo, hi]; null maps to null (sorts first). A collapsed
   *  range (lo == hi) maps everything to cell 0. */
  def gridCoord(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1L << bits) - 1
    if (!(hi > lo)) when(c.isNull, lit(null).cast("long")).otherwise(lit(0L))
    else least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * cells).cast("long"),
      lit(0L)), lit(cells))
  }

  /** Interleave the low `bits` bits of the given grid coordinates into
   *  one Morton value: output bit (i*k + c) = bit i of column c. Null
   *  in any coordinate nulls the z-value. */
  def zValue(coords: Seq[Column], bits: Int): Column = {
    val k = coords.size
    require(k >= 1 && bits * k <= 63, s"z-order overflow: $k cols x $bits bits")
    val terms = for (i <- 0 until bits; c <- 0 until k) yield
      shiftleft(shiftright(coords(c), i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_ bitwiseOR _)
  }
}
