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
    * Single aggregation, no shuffle beyond the partial/final agg.
    * `df.col(c)` (exact-name resolution) rather than `col(c)` so
    * names containing dots or backticks are read literally. A data
    * column literally named "rows" would collide with the `n_rows`
    * total in this wide shape — rejected up front. */
  def coverage(df: DataFrame, runId: String): DataFrame = {
    require(!df.columns.contains("rows"),
      "coverage(): a column named 'rows' collides with the n_rows total; rename it first")
    val aggs = count(lit(1)).as("n_rows") +:
      df.columns.toSeq.map(c =>
        sum(when(df.col(c).isNotNull, 1).otherwise(0)).as(s"n_$c"))
    df.agg(aggs.head, aggs.tail: _*).withColumn("run_id", lit(runId))
  }

  /** Long-form coverage (column, populated, share) — the report shape.
    * Built as an explode over an array of structs, not a stack()
    * selectExpr: no SQL-string interpolation, so arbitrary column
    * names (quotes, backticks, a column named "rows") are safe, and
    * the per-column counts use positional internal names that cannot
    * collide with data columns. */
  def coverageLong(df: DataFrame, runId: String): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__graft_total") +:
      cols.zipWithIndex.map { case (c, i) =>
        sum(when(df.col(c).isNotNull, 1).otherwise(0)).as(s"__graft_c$i")
      }
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"__graft_c$i").as("populated"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(runId).as("run_id"), col("__graft_total").as("n_rows"),
        explode(array(pairs: _*)).as("kv"))
      .select(col("run_id"), col("n_rows"),
        col("kv.column").as("column"), col("kv.populated").as("populated"))
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
