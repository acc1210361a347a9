package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exprs, MultiValue, Tables => T}
import graft.functions.{NativeExpressions, SmartTitle, TextNorm, Uuids}
import graft.operators.TextAnalysis

/** Projection / filter predicates P3-P8 (§2.2) and the scalar-function
  * surface (§2.8): multi-value codec, regex, path functions, date
  * canonicalization, JSON, unpivot, case engines, uuids. Everything
  * except the four UDF families (titlecase / smart_title / NFKD / uuid)
  * is a pure Column expression inside whole-stage codegen.
  */
object StringQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // P3: TRIM + empty→NULL normalization (ref tm_polars null policy).
    "p3_normblank" -> ((s, d) => T.documents(s, d)
      .select(col("doc_id"),
        Exprs.normBlank(concat(lit(" "), col("lang"), lit(" ")))
          .as("lang_norm"))
      .orderBy("doc_id")),

    // P5: delimiter/substring-containment candidate filter (ref
    // 17-...py:106-132) — only rows needing work enter the transform.
    "p5_contains_filter" -> ((s, d) => T.documents(s, d)
      .filter(instr(col("text"), "stream") > 0)
      .select("doc_id")
      .orderBy("doc_id")),

    // P7: md5 validity predicate (ref tm_polars.py:38-50).
    "p7_md5_validity" -> ((s, d) => T.documents(s, d)
      .withColumn("sig",
        when(col("doc_id") % 7 === 0, lit("00000000"))
          .when(col("doc_id") % 5 === 0, lit(null))
          .otherwise(md5(col("text"))))
      .select(col("doc_id"), Exprs.md5Valid(col("sig")).as("valid"))
      .orderBy("doc_id")),

    // P8: path-prefix filter (ref tags2db.py:1387-1403 GLOB 'prefix*').
    "p8_prefix_filter" -> ((s, d) => T.documents(s, d)
      .filter(col("source").startsWith("src1"))
      .select("doc_id", "source")
      .orderBy("doc_id")),

    // §2.8 path functions: dirname / basename / album_root — all pure
    // expressions (ref tm_album.py:30-86 needed a Python UDF).
    "path_fns" -> ((s, d) => {
      val p = concat(lit("lib/"), col("source"), lit("/"), col("lang"),
        lit("/cd 1"))
      T.documents(s, d).select(col("doc_id"),
        Exprs.dirname(p).as("dir"), Exprs.basename(p).as("base"),
        Exprs.albumRoot(p).as("root"))
        .orderBy("doc_id")
    }),

    // §2.8 multi-value codec: split → trim → drop empties → dedupe →
    // rejoin (ref tm_polars.py:53-70) — order-insensitive projections
    // here (sorted signature); first-seen-order is unit-tested.
    "mv_normalize" -> ((s, d) => {
      val ws = TextAnalysis.wordTokens(col("text"))
      T.documents(s, d).select(col("doc_id"),
        size(ws).as("n_toks"),
        size(array_distinct(ws)).as("n_uniq"),
        element_at(ws, 1).as("first_tok"),
        array_join(array_sort(array_distinct(ws)), "|").as("sig"))
        .orderBy("doc_id")
    }),

    // §2.8 regex extract (ref bracket-suffix extraction 03-...py:199-214).
    "f_regex_extract" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long")
          .as("name_id"))
      .orderBy("c_custkey")),

    // §2.8 concat_ws (ref 09-...py:98-101).
    "f_concat_ws" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey"),
        concat_ws("; ", col("c_name"), col("c_mktsegment")).as("disp"))
      .orderBy("c_custkey")),

    // §2.8 date canonicalization via regex rewrite (ref 20-...py:95-222).
    "f_date_canon" -> ((s, d) => {
      val raw = date_format(col("o_orderdate"), "yyyy/MM/dd")
      T.orders(s, d).select(col("o_orderkey"), raw.as("raw"),
        regexp_replace(raw, "^(\\d{4})/(\\d{2})/(\\d{2})\\z", "$1-$2-$3")
          .as("canon"),
        substring(raw, 1, 4).as("yr"))
        .orderBy("o_orderkey")
    }),

    // §2.8 mojibake / CRLF cleanup (ref 02-...py:66-79).
    "f_ws_cleanup" -> ((s, d) => T.documents(s, d)
      .select(col("doc_id"),
        TextNorm.cleanWs(concat(col("lang"), lit("\r\n"), col("source"),
          lit("  x"))).as("cleaned"))
      .orderBy("doc_id")),

    // §2.8 JSON extraction (ref 11-...py:253-266 → from_json).
    "f_json_extract" -> ((s, d) => T.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")),

    // §2.8 generators: unpivot/melt to long form (ref 15-...py:149-156).
    "f_unpivot" -> ((s, d) => T.part(s, d)
      .selectExpr("p_partkey",
        "stack(2, 'brand', p_brand, 'type', p_type) AS (attr, val)")
      .orderBy("p_partkey", "attr")),

    // §2.8 title-case engine (native Catalyst expression with codegen;
    // oracle over this corpus's constrained vocabulary, the general
    // rules unit-tested).
    "f_titlecase" -> ((s, d) => T.documents(s, d)
      .select(col("doc_id"),
        NativeExpressions.titleCase(substring(col("text"), 1, 60))
          .as("titled"))
      .orderBy("doc_id")),

    // §2.8 smart contributor casing (UDF; oracle over this corpus's
    // constrained name domain, prefix rules unit-tested).
    "f_smart_title" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey"),
        SmartTitle.smartTitleUdf(
          lower(regexp_replace(col("c_name"), "#", " "))).as("cased"))
      .orderBy("c_custkey")),

    // §2.8 NFKD normalization (UDF; oracle-exact on this ASCII corpus
    // with the injected accent, Unicode engine unit-tested).
    "f_nfkd" -> ((s, d) => T.documents(s, d)
      .select(col("doc_id"),
        TextNorm.nfkdUdf(concat(lit("é "), substring(col("text"), 1, 20)))
          .as("folded"))
      .orderBy("doc_id")),

    // §2.12 deterministic UUIDv5 (native Catalyst expression; RFC
    // vectors unit-tested).
    "f_uuid5" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey"),
        NativeExpressions.uuid5(lit(Uuids.NsDns), col("c_name")).as("uuid"))
      .orderBy("c_custkey")),

    // §2.12 UUIDv7 generation + validity check (ref 16-...py:40-84):
    // values are nondeterministic, the validity aggregate is not.
    "f_uuid7_validity" -> ((s, d) => {
      val u = T.customer(s, d)
        .withColumn("u", Uuids.uuid7Udf())
      u.agg(count(lit(1)).as("n_rows"),
        sum(when(substring(col("u"), 15, 1) === "7", 1).otherwise(0))
          .as("n_valid"))
    }),

    // P6-style dictionary-candidate filter (ref 07-...py:250-294): keep
    // rows where any token hits the broadcast dictionary.
    "p6_dict_filter" -> ((s, d) => {
      val dict = array(lit("spark"), lit("vector"), lit("stream"))
      T.documents(s, d)
        .filter(exists(TextAnalysis.wordTokens(col("text")),
          t => array_contains(dict, t)))
        .select("doc_id")
        .orderBy("doc_id")
    }),
  )

  val sql: Map[String, String] = Map(
    "p3_normblank" ->
      """SELECT doc_id, NULLIF(TRIM(' ' || lang || ' '), '') AS lang_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p5_contains_filter" ->
      """SELECT doc_id FROM documents WHERE instr(text, 'stream') > 0
        |ORDER BY doc_id""".stripMargin,
    "p7_md5_validity" ->
      """SELECT doc_id, NOT (sig2 = '' OR regexp_matches(sig2, '^0+$')) AS valid
        |FROM (SELECT doc_id, regexp_replace(COALESCE(
        |CASE WHEN doc_id % 7 = 0 THEN '00000000'
        |     WHEN doc_id % 5 = 0 THEN NULL ELSE md5(text) END,
        |''), '-', '', 'g') AS sig2 FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "p8_prefix_filter" ->
      """SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'
        |ORDER BY doc_id""".stripMargin,
    "path_fns" ->
      """SELECT doc_id,
        |regexp_extract(p, '^(.*)/[^/]*$', 1) AS dir,
        |string_split(p, '/')[-1] AS base,
        |regexp_replace(p, '(?i)/(?:cd|disc)\s*0*\d{1,3}$', '') AS root
        |FROM (SELECT doc_id,
        |'lib/' || source || '/' || lang || '/cd 1' AS p FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "mv_normalize" ->
      """SELECT doc_id, CAST(len(ws) AS INT) AS n_toks,
        |CAST(len(list_distinct(ws)) AS INT) AS n_uniq,
        |ws[1] AS first_tok,
        |array_to_string(list_sort(list_distinct(ws)), '|') AS sig
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "f_regex_extract" ->
      """SELECT c_custkey,
        |CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_id
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f_concat_ws" ->
      """SELECT c_custkey, concat_ws('; ', c_name, c_mktsegment) AS disp
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f_date_canon" ->
      """SELECT o_orderkey, raw,
        |regexp_replace(raw, '^(\d{4})/(\d{2})/(\d{2})$', '\1-\2-\3') AS canon,
        |substr(raw, 1, 4) AS yr
        |FROM (SELECT o_orderkey, strftime(o_orderdate, '%Y/%m/%d') AS raw
        |FROM orders) ORDER BY o_orderkey""".stripMargin,
    "f_ws_cleanup" ->
      """SELECT doc_id, TRIM(regexp_replace(regexp_replace(
        |lang || chr(13) || chr(10) || source || '  x',
        |'[\r\n\t]+', ' ', 'g'), ' {2,}', ' ', 'g')) AS cleaned
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f_json_extract" ->
      """SELECT event_id,
        |CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "f_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |SELECT p_partkey, p_brand AS brand, p_type AS "type" FROM part)
        |UNPIVOT (val FOR attr IN (brand, "type"))
        |ORDER BY p_partkey, attr""".stripMargin,
    "p6_dict_filter" ->
      """SELECT doc_id FROM documents WHERE len(list_filter(
        |string_split(text, ' '),
        |t -> t IN ('spark', 'vector', 'stream'))) > 0
        |ORDER BY doc_id""".stripMargin,
    // documents.text is plain ASCII ([a-z0-9 ]), so NFKD of the input
    // is folding the injected 'é' to 'e' plus whitespace collapse+trim
    // — both exactly expressible here. The Unicode-general engine is
    // unit-tested (TextNormSpec: ligatures, combining marks).
    "f_nfkd" ->
      """SELECT doc_id,
        |TRIM(regexp_replace('e ' || substr(text, 1, 20), '\s+', ' ', 'g'))
        |AS folded
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The title-case engine restricted to this corpus: 31 lowercase
    // ASCII words, none Roman-numeral-parseable or force-upper, no
    // hyphens/apostrophes — so the active rules are exactly edge-word
    // capitalization and interior small-word lowering. The general
    // engine (numerals, McCartney guard, contractions) is unit-tested
    // in TitleCaseSpec.
    "f_titlecase" ->
      """SELECT doc_id, array_to_string(list_transform(ws, (w, i) ->
        |  CASE WHEN w = '' THEN ''
        |  WHEN i = 1 OR i = li THEN upper(w[1]) || w[2:]
        |  WHEN w IN ('a','an','and','as','at','but','by','for','from',
        |    'in','into','nor','of','off','on','onto','or','out','over',
        |    'per','the','to','up','upon','via','with') THEN w
        |  ELSE upper(w[1]) || w[2:] END), ' ') AS titled
        |FROM (SELECT doc_id, ws,
        |  CASE WHEN ws[len(ws)] = '' THEN len(ws) - 1 ELSE len(ws) END AS li
        |  FROM (SELECT doc_id, string_split(substr(text, 1, 60), ' ') AS ws
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // smartTitle on 'customer NNNNNNNNN': no Mc/Mac/Fitz/O' prefixes,
    // no non-leading particles — every word just capitalizes its first
    // character (digits are unchanged by toUpper). Prefix/particle
    // rules are unit-tested in SmartTitleSpec.
    "f_smart_title" ->
      """SELECT c_custkey, array_to_string(list_transform(
        |  string_split(lower(replace(c_name, '#', ' ')), ' '),
        |  w -> CASE WHEN w = '' THEN '' ELSE upper(w[1]) || w[2:] END),
        |  ' ') AS cased
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
