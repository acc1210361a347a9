package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY §2
  * (plus the LLM-pipeline operators); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query (same column names/types,
  * same total-order ORDER BY). The only rows-only queries are the
  * genuinely non-SQL-expressible two: sha1-based uuid5 (DuckDB has no
  * sha1) and time-based uuid7 — everything else, including both
  * approximate-ANN paths and the iterative k-means, hash-matches.
  */
object SparkEntry {

  private[graft] val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (AggQueries.defs, AggQueries.sql),
    (JoinQueries.defs, JoinQueries.sql),
    (WindowQueries.defs, WindowQueries.sql),
    (StringQueries.defs, StringQueries.sql),
    (CdcQueries.defs, CdcQueries.sql),
    (LlmQueries.defs, LlmQueries.sql),
    (StreamQueries.defs, StreamQueries.sql),
    (MiscQueries.defs, MiscQueries.sql),
    (PipelineQueries.defs, PipelineQueries.sql),
    (ReportQueries.defs, ReportQueries.sql),
    (StoreQueries.defs, StoreQueries.sql),
    (TemporalQueries.defs, TemporalQueries.sql),
  )

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.defs("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
