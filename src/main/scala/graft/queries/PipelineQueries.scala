package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.core.{MultiValue, Tables => T}
import graft.ops.{Pipeline, Steps}

/** The reference's concrete numbered pipeline steps as CDC-audited,
  * driver-checked queries (SURVEY §3.2): involvedpeople role fan-out
  * merge (01), dictionary contributor normalization (06), genre/style
  * normalization (10), genre enrichment (11), and uuid assignment (16),
  * plus a composed multi-step run reporting the per-step changelog
  * summary — the way a reference user actually consumes the engine.
  * Every scenario is built deterministically from the test tables so
  * DuckDB can restate the expected outcome from first principles.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private val D = MultiValue.Delim

  /** customer with the packed involvedpeople string and per-target
    * existing values exercising casefold-dup / append / fill-null. */
  private def involvedTable(s: SparkSession, d: String): DataFrame =
    T.customer(s, d).select(
      col("c_custkey"),
      concat(lit("P"), (col("c_custkey") % 50).cast("string"),
        lit(", MainArtist - Q"), (col("c_custkey") % 30).cast("string"),
        lit(", ComposerLyricist, Producer")).as("packed"),
      when(col("c_custkey") % 3 === 0,
        concat(lit("p"), (col("c_custkey") % 50).cast("string")))
        .when(col("c_custkey") % 3 === 1, lit("X"))
        .otherwise(lit(null).cast("string")).as("albumartist"),
      lit(null).cast("string").as("composer"),
      concat(lit("Q"), (col("c_custkey") % 30).cast("string")).as("lyricist"))

  val defs: Map[String, Q] = Map(
    // 01: involvedpeople fan-out merge (ref 01-...py:136-253, 312-412).
    "pl_involved_merge" -> ((s, d) => {
      val (state, _) = Pipeline.run(involvedTable(s, d), "c_custkey",
        Seq(Steps.involvedPeopleMerge("packed")))
      state.select("c_custkey", "albumartist", "composer", "lyricist")
        .orderBy("c_custkey")
    }),

    // 06: dictionary contributor normalization (ref 06-...py:438-585):
    // dictionary = vetted nation names; the cell exercises the
    // conservative '&' split (both sides resolve, whole does not), the
    // ';' primary split, exact dedupe, and the smart-title fallback.
    "pl_dict_contributors" -> ((s, d) => {
      val dict = T.nation(s, d).select(lower(col("n_name")).as("k"),
        initcap(col("n_name")).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(lower(col("n_name")), lit(" & "), upper(col("n_name")),
            lit(";"), lower(col("c_mktsegment"))).as("contrib"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.dictContributors(Seq("contrib"), dict)))
      state.select("c_custkey", "contrib").orderBy("c_custkey")
    }),

    // 10: genre/style normalization against a validation table (ref
    // 10-...py:200-341, 556-637): mixed [,;|] delimiters harmonize,
    // unknown tags drop, hard-coded replacements apply first, style
    // merges into genre.
    "pl_genre_norm" -> ((s, d) => {
      import s.implicits._
      val valid = T.nation(s, d).select(initcap(col("n_name")).as("tag"))
        .union(Seq("Blues", "Swing").toDF("tag"))
      val table = T.customer(s, d)
        .join(broadcast(T.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(lower(col("n_name")), lit(", unknowntag; "),
            upper(col("n_name")), lit("|blues"),
            when(col("c_custkey") % 3 === 0, lit("|oldies"))
              .otherwise(lit(""))).as("genre"),
          when(col("c_custkey") % 2 === 0, lit("blues"))
            .otherwise(lit(null).cast("string")).as("style"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.genreNormalize("c_custkey", "genre", "style", valid,
          hardCoded = Map("oldies" -> "Swing"))))
      state.select("c_custkey", "genre", "style").orderBy("c_custkey")
    }),

    // 11: genre enrichment from an artist-keyed reference (ref
    // 11-...py:367-425): only missing/generic genres enrich; tags
    // append with exact first-seen dedupe.
    "pl_genre_enrich" -> ((s, d) => {
      val ref = T.nation(s, d).select(col("n_nationkey"),
        concat(initcap(col("n_name")), lit(D), lit("Folk")).as("ref_genre"),
        lit("Roots").as("ref_styles"))
      val table = T.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"),
        when(col("c_custkey") % 4 === 1, lit("Pop"))
          .when(col("c_custkey") % 4 === 2, lit("Jazz"))
          .when(col("c_custkey") % 4 === 3, lit("Settled"))
          .otherwise(lit(null).cast("string")).as("genre"),
        lit(null).cast("string").as("style"))
      val (state, _) = Pipeline.run(table, "c_custkey",
        Seq(Steps.genreEnrich("c_nationkey", ref)))
      state.select("c_custkey", "genre", "style").orderBy("c_custkey")
    }),

    // 16: uuid assignment (ref 16-...py:40-84): NULL/blank/non-v7 ids
    // get a fresh uuid7 (value non-deterministic → the oracle checks
    // the assignment decision and v7 shape, both deterministic).
    "pl_uuid_assign" -> ((s, d) => {
      val table = T.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 1, lit(""))
          .when(col("doc_id") % 3 === 2,
            concat(lit("00000000-0000-7000-8000-"),
              lpad(col("doc_id").cast("string"), 12, "0")))
          .otherwise(lit(null).cast("string")).as("track_uuid"))
        .withColumn("__orig", col("track_uuid"))
      val (state, _) = Pipeline.run(table, "doc_id",
        Seq(Steps.uuidAssign("track_uuid")))
      state.select(col("doc_id"),
        (!(col("track_uuid") <=> col("__orig"))).as("assigned"),
        col("track_uuid").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
          .as("is_v7"))
        .orderBy("doc_id")
    }),

    // Composed pipeline: 01 then 16 over one table, consuming the
    // per-step changelog summary — the reference's operational loop
    // (run numbered scripts, read the changelog report).
    "pl_steps_summary" -> ((s, d) => {
      val table = involvedTable(s, d)
        .withColumn("track_uuid", lit(null).cast("string"))
      val (_, log) = Pipeline.run(table, "c_custkey", Seq(
        Steps.involvedPeopleMerge("packed"),
        Steps.uuidAssign("track_uuid")))
      Cdc.summarize(log).orderBy("script", "column")
    }),
  )

  val sql: Map[String, String] = Map(
    // %3=0 rows: casefold-dup with existing 'p<n>' → unchanged; %3=1:
    // append behind 'X'; %3=2: fill the null. composer fills everywhere;
    // lyricist is an exact dup → untouched.
    "pl_involved_merge" ->
      """SELECT c_custkey,
        |CASE WHEN c_custkey % 3 = 0 THEN 'p' || CAST(c_custkey % 50 AS VARCHAR)
        |     WHEN c_custkey % 3 = 1 THEN 'X\\P' || CAST(c_custkey % 50 AS VARCHAR)
        |     ELSE 'P' || CAST(c_custkey % 50 AS VARCHAR) END AS albumartist,
        |'Q' || CAST(c_custkey % 30 AS VARCHAR) AS composer,
        |'Q' || CAST(c_custkey % 30 AS VARCHAR) AS lyricist
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // '&' splits (both sides resolve to the same canonical → one token),
    // ';' splits, the segment falls back to the surname-aware caser —
    // which Mac-cases 'machinery' → 'MacHinery' (the Mc/Mac prefix rule;
    // the oracle states the engine's documented behavior on this corpus).
    // DuckDB has no initcap — capitalize per word via list_transform.
    "pl_dict_contributors" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat,
        |  CASE WHEN c_mktsegment = 'MACHINERY' THEN 'MacHinery'
        |    ELSE upper(c_mktsegment[1]) || lower(c_mktsegment[2:]) END AS seg
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey, nat || '\\' || seg AS contrib
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_genre_norm" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |nat || '\\Blues' ||
        |  CASE WHEN c_custkey % 3 = 0 THEN '\\Swing' ELSE '' END AS genre,
        |CASE WHEN c_custkey % 2 = 0 THEN 'Blues' ELSE NULL END AS style
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_genre_enrich" ->
      """WITH cap AS (SELECT c_custkey,
        |  array_to_string(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), ' ') AS nat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |CASE WHEN c_custkey % 4 = 1 THEN 'Pop\\' || nat || '\\Folk'
        |     WHEN c_custkey % 4 = 2 THEN 'Jazz\\' || nat || '\\Folk'
        |     WHEN c_custkey % 4 = 3 THEN 'Settled'
        |     ELSE nat || '\\Folk' END AS genre,
        |CASE WHEN c_custkey % 4 = 3 THEN NULL ELSE 'Roots' END AS style
        |FROM cap ORDER BY c_custkey""".stripMargin,
    "pl_uuid_assign" ->
      """SELECT doc_id, doc_id % 3 IN (0, 1) AS assigned, true AS is_v7
        |FROM documents ORDER BY doc_id""".stripMargin,
    // step 01 logs albumartist appends (%3=1 modify, %3=2 add) and the
    // composer fill (every row an add); lyricist never changes so no
    // row; step 16 adds a uuid to every row.
    "pl_steps_summary" ->
      """SELECT * FROM (
        |SELECT '01_involved_merge' AS script, 'albumartist' AS "column",
        |  CAST(SUM(CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changes,
        |  CAST(COUNT(DISTINCT CASE WHEN c_custkey % 3 <> 0 THEN c_custkey END)
        |    AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN c_custkey % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_add,
        |  CAST(0 AS BIGINT) AS n_delete,
        |  CAST(SUM(CASE WHEN c_custkey % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_modify,
        |  CAST(0 AS BIGINT) AS n_noop
        |FROM customer
        |UNION ALL
        |SELECT '01_involved_merge', 'composer', COUNT(*),
        |  COUNT(DISTINCT c_custkey), COUNT(*), 0, 0, 0 FROM customer
        |UNION ALL
        |SELECT '16_uuid_assign', 'track_uuid', COUNT(*),
        |  COUNT(DISTINCT c_custkey), COUNT(*), 0, 0, 0 FROM customer)
        |ORDER BY script, "column"""".stripMargin,
  )
}
