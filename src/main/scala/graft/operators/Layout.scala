package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout for scan pruning — the table-
  * maintenance side of a 100 TB store. Min/max footer statistics prune
  * parquet files on ONE sort dimension; interleaving the bits of two
  * filter columns into a Morton z-value and range-partitioning on it
  * gives every output file a bounded rectangle in BOTH dimensions, so
  * selective filters on either column skip most files. This is the
  * standard Z-ORDER optimization of lakehouse table formats, expressed
  * with plain Spark: a pure bit-interleave expression +
  * `repartitionByRange` + `sortWithinPartitions`.
  */
object Layout {

  /** Morton z-value of two non-negative integer columns over their low
    * `bits` bits: output bit 2i is bit i of `x`, bit 2i+1 is bit i of
    * `y`. Pure integer arithmetic (shift/and/add) — codegen'd, engine-
    * portable, no UDF. `bits` ≤ 31 keeps the result inside a long. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Lay a frame out in z-order across `numFiles` range partitions:
    * each output file covers a contiguous z-range = a bounded rectangle
    * in (x, y), so min/max stats prune scans filtered on either column.
    * The range partitioner samples the z distribution, so skewed inputs
    * still split into balanced files. */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String,
               bits: Int, numFiles: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
