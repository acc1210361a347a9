package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage snapshots (ref `src/tagminder/core/tm_snapshots.py:56-218`):
  * aggregate-only captures (never row copies) taken before/after a
  * pipeline run and diffed for the compare dashboard (ref 90/91
  * scripts). One pass computes per-column populated counts via
  * conditional-sum fan-out — the A3 pattern widened to the full schema.
  */
object Snapshots {

  /** One-row snapshot: total rows + a populated-count per column.
    * Single aggregation, no shuffle beyond the partial/final agg. */
  def coverage(df: DataFrame, runId: String): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      df.columns.toSeq.map(c =>
        sum(when(col(c).isNotNull, 1).otherwise(0)).as(s"n_$c"))
    df.agg(aggs.head, aggs.tail: _*).withColumn("run_id", lit(runId))
  }

  /** Long-form coverage (column, populated, share) — the report shape. */
  def coverageLong(df: DataFrame, runId: String): DataFrame = {
    val wide = coverage(df, runId)
    val cols = df.columns.toSeq
    val stacked = cols.map(c =>
      s"'$c', CAST(n_$c AS BIGINT)").mkString(", ")
    wide.selectExpr("run_id", "n_rows",
      s"stack(${cols.length}, $stacked) AS (column, populated)")
      .withColumn("share",
        col("populated").cast("double") / col("n_rows"))
  }

  /** Compare two long-form snapshots by column → coverage delta
    * (ref 91-compare dashboards). */
  def compare(before: DataFrame, after: DataFrame): DataFrame =
    before.select(col("column"), col("populated").as("before"))
      .join(after.select(col("column"), col("populated").as("after")),
        Seq("column"), "full_outer")
      .withColumn("delta",
        coalesce(col("after"), lit(0L)) - coalesce(col("before"), lit(0L)))
}
