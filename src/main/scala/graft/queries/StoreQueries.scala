package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.sources.{AlibStore, DelimitedSources}

/** Store-lifecycle and delimited-source operators as driver-checked
  * queries (SURVEY §2.1 S5/S12/S14, §2.2 P4, §2.9 M6/M8): each builds a
  * deterministic scenario from the provided tables so the DuckDB oracle
  * can state the expected outcome directly. The round-trip queries
  * write a real delimited file under /tmp and read it back through the
  * source — parsing, null encoding and validation are exercised
  * end-to-end, not mocked.
  */
object StoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // S5: INSERT OR REPLACE upsert — incoming (10% of docs, lang
    // rewritten) wins on key collision, everything else survives.
    "s5_upsert" -> ((s, d) => {
      val cur = T.documents(s, d)
      val inc = cur.filter(col("doc_id") % 10 === 0)
        .withColumn("lang", lit("xx"))
      AlibStore.upsert(cur, inc, "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // P4: allowlist column nulling — everything outside the keep set
    // (and not system-prefixed) is nulled, schema preserved.
    "p4_keepcols" -> ((s, d) =>
      AlibStore.applyKeepColumns(T.documents(s, d),
          keep = Set("doc_id", "lang"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // M6: rebuild dropping all-null non-system columns — the injected
    // empty data column goes, the system column stays.
    "m6_rebuild" -> ((s, d) => {
      val df = T.documents(s, d)
        .withColumn("all_null", lit(null).cast("string"))
        .withColumn("__sys_null", lit(null).cast("string"))
      val out = AlibStore.rebuildDroppingEmpty(df)
      out.select(col("doc_id"), col("lang"),
          lit(out.columns.length).as("n_cols"))
        .orderBy("doc_id")
    }),

    // M8: key rename with referential rewrite, verified via the
    // post-rename distribution (changelog rewrite is spec-covered).
    "m8_rename" -> ((s, d) => {
      import s.implicits._
      val renames = Seq(("src1", "source_one"), ("src2", "source_two"))
        .toDF("old", "new")
      val cur = T.documents(s, d)
      val log = cur.select(col("source").as("key"),
        lit("lang").as("column"))
      val (newAlib, _) = AlibStore.renameWithRewrite(cur, log, "source", renames)
      newAlib.groupBy("source").agg(count(lit(1)).as("n"))
        .orderBy("source")
    }),

    // S12: MB-style TSV round-trip — write tab-separated with \N nulls,
    // read back through the source; null encoding must survive.
    "s12_tsv_roundtrip" -> ((s, d) => {
      val src = T.customer(s, d).select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_mktsegment")).as("seg"))
      val dir = "/tmp/graft_s12_tsv"
      src.write.mode("overwrite").option("sep", "\t")
        .option("nullValue", "\\N").option("header", "false")
        .option("quote", "").csv(dir)
      DelimitedSources.readMbTsv(s, dir, src.schema)
        .orderBy("c_custkey")
    }),

    // S14: pipe-delimited DR-score round-trip — every 11th row is
    // malformed on purpose; validation must flag, not drop.
    "s14_dr_roundtrip" -> ((s, d) => {
      val lines = T.customer(s, d).select(
        when(col("c_custkey") % 11 === 0,
          concat(col("c_name"), lit("|missing")))
          .otherwise(concat(col("c_name"), lit("|DR"),
            (col("c_custkey") % 15).cast("int"))).as("value"))
      val dir = "/tmp/graft_s14_dr"
      lines.write.mode("overwrite").text(dir)
      DelimitedSources.readDrScores(s, dir)
        .orderBy("raw")
    }),
  )

  val sql: Map[String, String] = Map(
    "s5_upsert" ->
      """SELECT doc_id,
        |CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p4_keepcols" ->
      """SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
        |CAST(NULL AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m6_rebuild" ->
      """SELECT doc_id, lang, CAST(6 AS INT) AS n_cols
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m8_rename" ->
      """SELECT CASE WHEN source = 'src1' THEN 'source_one'
        |WHEN source = 'src2' THEN 'source_two' ELSE source END AS source,
        |COUNT(*) AS n FROM documents GROUP BY 1 ORDER BY source""".stripMargin,
    "s12_tsv_roundtrip" ->
      """SELECT c_custkey, c_name,
        |CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "s14_dr_roundtrip" ->
      """SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS key,
        |CASE WHEN c_custkey % 11 = 0 THEN NULL
        |  ELSE CAST(c_custkey % 15 AS INT) END AS dr,
        |c_custkey % 11 <> 0 AS valid,
        |CASE WHEN c_custkey % 11 = 0 THEN c_name || '|missing'
        |  ELSE c_name || '|DR' || CAST(c_custkey % 15 AS VARCHAR) END AS raw
        |FROM customer ORDER BY raw""".stripMargin,
  )
}
