package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.core.{Tables => T}

/** CDC operators M1/M2/A15: the diff-and-log engine driven by a
  * deterministic normalization transform (collapse the repeated-word
  * stutter "batch batch" → "batch"), so the DuckDB oracle can recompute
  * the expected changelog from first principles.
  */
object CdcQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Script = "norm_text"

  private def diff(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val orig = T.documents(s, d)
    val next = orig.withColumn("text",
      regexp_replace(col("text"), "batch batch", "batch"))
    Cdc.diffAndLog(orig, next, "doc_id", Seq("text", "lang"), Script)
  }

  val defs: Map[String, Q] = Map(
    // M1: field-level changelog (ref tm_changes.py:41-177).
    "cdc_changelog" -> ((s, d) => diff(s, d)._2
      .orderBy("key", "column")),

    // M1/M2: changed-rows projection with __sqlmodded bump
    // (ref tm_db.py:580-596 NULLIF(?,0) convention; mask 06-...py:591-608).
    "cdc_changed_rows" -> ((s, d) => diff(s, d)._1
      .orderBy("doc_id")),

    // A15: changelog summary (ref tm_changelog.py:101-258).
    "cdc_summary" -> ((s, d) => Cdc.summarize(diff(s, d)._2)
      .orderBy("script", "column")),
  )

  val sql: Map[String, String] = Map(
    "cdc_changelog" ->
      """SELECT doc_id AS key, 'text' AS "column", text AS old_value,
        |regexp_replace(text, 'batch batch', 'batch', 'g') AS new_value,
        |'norm_text' AS script
        |FROM documents
        |WHERE text <> regexp_replace(text, 'batch batch', 'batch', 'g')
        |ORDER BY key""".stripMargin,
    "cdc_changed_rows" ->
      """SELECT doc_id,
        |regexp_replace(text, 'batch batch', 'batch', 'g') AS text,
        |lang, 1 AS __sqlmodded
        |FROM documents
        |WHERE text <> regexp_replace(text, 'batch batch', 'batch', 'g')
        |ORDER BY doc_id""".stripMargin,
    "cdc_summary" ->
      """SELECT 'norm_text' AS script, 'text' AS "column",
        |COUNT(*) AS n_changes, COUNT(DISTINCT doc_id) AS n_rows,
        |CAST(0 AS BIGINT) AS n_add, CAST(0 AS BIGINT) AS n_delete,
        |COUNT(*) AS n_modify
        |FROM documents
        |WHERE text <> regexp_replace(text, 'batch batch', 'batch', 'g')""".stripMargin,
  )
}
