package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.core.{Snapshots, Tables => T}
import graft.ops.{Pipeline, Transform}

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

    // A15 no-op accounting: scripts that write old==new entries are a
    // regression signal; logNoops reproduces them and summarize counts
    // them per (script, column) without polluting the change classes
    // (ref tm_changelog.py:125-140, 184-191).
    "cdc_noop_summary" -> ((s, d) => {
      val orig = T.documents(s, d)
      val next = orig.withColumn("text",
        regexp_replace(col("text"), "batch batch", "batch"))
      val (_, log) = Cdc.diffAndLog(orig, next, "doc_id",
        Seq("text", "lang"), Script, logNoops = true)
      Cdc.summarize(log).orderBy("script", "column")
    }),

    // §3.2 pipeline: two audited steps through the Transform framework,
    // reporting the per-step changelog summary.
    "pl_two_step" -> ((s, d) => {
      val steps = Seq(
        Transform("01_norm_text", Seq("text"),
          df => df.withColumn("text",
            regexp_replace(col("text"), "batch batch", "batch"))),
        Transform("02_upper_source", Seq("source"),
          df => df.withColumn("source", upper(col("source")))))
      val (_, log) = Pipeline.run(T.documents(s, d), "doc_id", steps)
      Cdc.summarize(log).orderBy("script", "column")
    }),

    // Snapshot coverage fan-out over the full documents schema
    // (ref tm_snapshots.py:157-218) — one aggregation pass.
    "sn_coverage_wide" -> ((s, d) =>
      Snapshots.coverage(T.documents(s, d), "r1")),
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
        |COUNT(*) AS n_modify, CAST(0 AS BIGINT) AS n_noop
        |FROM documents
        |WHERE text <> regexp_replace(text, 'batch batch', 'batch', 'g')""".stripMargin,
    "cdc_noop_summary" ->
      """SELECT * FROM (
        |SELECT 'norm_text' AS script, 'lang' AS "column",
        |CAST(0 AS BIGINT) AS n_changes, CAST(0 AS BIGINT) AS n_rows,
        |CAST(0 AS BIGINT) AS n_add, CAST(0 AS BIGINT) AS n_delete,
        |CAST(0 AS BIGINT) AS n_modify, COUNT(*) AS n_noop
        |FROM documents
        |UNION ALL
        |SELECT 'norm_text', 'text',
        |CAST(SUM(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(COUNT(DISTINCT CASE WHEN chg THEN doc_id END) AS BIGINT),
        |CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |CAST(SUM(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(SUM(CASE WHEN chg THEN 0 ELSE 1 END) AS BIGINT)
        |FROM (SELECT doc_id,
        |  text <> regexp_replace(text, 'batch batch', 'batch', 'g') AS chg
        |  FROM documents))
        |ORDER BY script, "column"""".stripMargin,
    "pl_two_step" ->
      """SELECT * FROM (
        |SELECT '01_norm_text' AS script, 'text' AS "column",
        |COUNT(*) AS n_changes, COUNT(DISTINCT doc_id) AS n_rows,
        |CAST(0 AS BIGINT) AS n_add, CAST(0 AS BIGINT) AS n_delete,
        |COUNT(*) AS n_modify, CAST(0 AS BIGINT) AS n_noop FROM documents
        |WHERE text <> regexp_replace(text, 'batch batch', 'batch', 'g')
        |UNION ALL
        |SELECT '02_upper_source', 'source', COUNT(*),
        |COUNT(DISTINCT doc_id), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |COUNT(*), CAST(0 AS BIGINT)
        |FROM documents WHERE source <> upper(source))
        |ORDER BY script, "column"""".stripMargin,
    "sn_coverage_wide" ->
      """SELECT COUNT(*) AS n_rows,
        |CAST(SUM(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_id,
        |CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
        |CAST(SUM(CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
        |CAST(SUM(CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_source,
        |CAST(SUM(CASE WHEN n_chars IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_n_chars,
        |'r1' AS run_id FROM documents""".stripMargin,
  )
}
