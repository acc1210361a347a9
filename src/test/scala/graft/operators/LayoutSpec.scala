package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (hand-checked)") {
    // x=3 (11), y=1 (01), 2 bits: z bits are y1 x1 y0 x0 = 0111 = 7
    val r = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 2)).collect().head.getLong(0)
    assert(r == 7L)
    // quadrant property: all coords < 2^k  =>  z < 4^k
    val z = Seq((5L, 9L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 4)).collect().head.getLong(0)
    assert(z < 256L)
  }

  test("zOrderBy bounds every output file in BOTH dimensions") {
    // a 64x64 grid; 16 output files. A 1-D sort on x gives every file
    // the full y range; z-order must keep both ranges sub-global for
    // every file, which is exactly the min/max-pruning property.
    val grid = spark.range(0, 64 * 64)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))
    val laid = Layout.zOrderBy(grid, "x", "y", bits = 6, numFiles = 16)
    val ranges = laid.select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(ranges.length > 1)
    ranges.foreach { r =>
      val (xSpan, ySpan) = (r.getLong(2) - r.getLong(1),
        r.getLong(4) - r.getLong(3))
      assert(xSpan < 63 && ySpan < 63,
        s"partition ${r.getInt(0)} spans the full grid: x=$xSpan y=$ySpan")
    }
  }
}
