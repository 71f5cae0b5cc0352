package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional pruning for scans
  * that filter on EITHER of two columns. A single-column sort makes
  * parquet min/max stats razor-sharp on that column and useless on
  * every other; interleaving the bits of two columns into one sort key
  * gives every file a bounded range in BOTH dimensions, so row-group /
  * file pruning works for either predicate (the capability Delta's
  * Z-ORDER BY and the Hudi/Iceberg layout optimizers provide). At
  * 100 TB the layout is the difference between "filter on the
  * secondary key reads everything" and "reads O(selectivity) files".
  *
  * Pure expression arithmetic (shift/mask/sum per bit — codegen'd,
  * engine-portable integer math the q100 oracle recomputes
  * bit-for-bit); the layout itself is one repartitionByRange on the
  * z-value plus an in-partition sort, exactly the total-order-write
  * shape used everywhere else.
  */
object ZOrder {

  /** Interleaved z-value of two non-negative ints confined to `bits`
    * bits each: x occupies even bit positions, y odd. bits <= 31 keeps
    * the result in a positive long. Values are masked into range
    * (callers bucket real keys first — pruning needs bounded
    * cardinality per dimension anyway). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xs = pmod(x.cast("long"), lit(1L << bits))
    val ys = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The z-ordered arrangement: range-partition + sort by the z-value,
    * ready for a parquet write whose per-file min/max are tight in
    * BOTH dimensions. */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numParts: Int = 0): DataFrame = {
    val p = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(p, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
