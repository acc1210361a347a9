package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-quality report every ETL engine grows:
  * per column, row/null/distinct counts and canonicalized min/max (ref
  * sanity reporting `scripts/reports/96-sanity-report.py` and the
  * coverage fan-outs of `scripts/reports/95-tag-coverage.py`, which this
  * generalizes to arbitrary tables).
  *
  * Scale shape: ONE wide aggregate over a single scan — count/min/max
  * per column plus a distinct count — then an inline explode of the
  * per-column result structs into one row per column. No per-column
  * scans, no driver-side loop; the distinct counts ride Spark's
  * aggregate expansion in the same shuffle. With `approx = true` the
  * distinct counts switch to HyperLogLog++ (`approx_count_distinct`),
  * which is how a 100 TB profile should run — the exact form exists for
  * oracle-checked correctness at test scale.
  */
object Profile {

  /** Canonical string form per type so min/max hash-compare across
    * engines: doubles as integer cents, everything else via plain
    * string cast (timestamps/dates render ISO in UTC sessions). */
  private def canon(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => round(c * 100).cast("long").cast("string")
    case _ => c.cast("string")
  }

  /** One row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { n =>
      val dt = df.schema(n).dataType
      Seq(
        count(col(n)).as(s"__c_$n"),
        (if (approx) approx_count_distinct(col(n))
         else countDistinct(col(n))).as(s"__d_$n"),
        canon(min(col(n)), dt).as(s"__mn_$n"),
        canon(max(col(n)), dt).as(s"__mx_$n"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.map(n => struct(
      lit(n).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__c_$n")).as("n_null"),
      col(s"__d_$n").as("n_distinct"),
      col(s"__mn_$n").as("min_s"),
      col(s"__mx_$n").as("max_s"))): _*)
    one.select(inline(rows))
  }
}
