package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.operators.{Decisions, EntityResolution, Fanout, Fuzzy, MatchStage}

/** Fuzzy matching and generator fan-out queries (SURVEY §2.8 / §2.12).
  * Both cosine variants are oracle-exact (integer dot products for
  * raw TF; 6-dp-rounded double folds for TF-IDF), as is the guarded
  * split's expected output on this corpus.
  */
object MiscQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Fuzzy char-3-gram cosine pairs over part names (ref string_grouper
    // stage, 10-...py:344-391) — shared-gram blocking, no cross join.
    // dfCap=200 exercises the stop-gram guard (grams in >200 names are
    // dropped from the dot side); the oracle applies the SAME cap, so
    // the capped semantics — not a tuned-to-pass no-op — are verified.
    "fz_tf_cosine" -> ((s, d) =>
      Fuzzy.tfCosinePairs(T.part(s, d), "p_name", n = 3, theta = 0.5,
          dfCap = 200)
        .orderBy("name_a", "name_b")),

    // TF-IDF-weighted fuzzy pairs (string_grouper scoring).
    "fz_tfidf_cosine" -> ((s, d) =>
      Fuzzy.tfidfCosinePairs(T.part(s, d), "p_name", n = 3, theta = 0.6,
          dfCap = 200)
        .orderBy("name_a", "name_b")),

    // involvedpeople-style role:person fan-out (ref 01-...py:136-253).
    "fan_out" -> ((s, d) => {
      val packed = concat(lit("supp:"), col("s_name"), lit(";cc:"),
        col("s_nationkey"))
      Fanout.fanOut(T.supplier(s, d).withColumn("packed", packed),
        "s_suppkey", "packed")
        .orderBy("s_suppkey", "role")
    }),

    // Entity-resolution waterfall (ref emit_contributors.py:1066-1478 +
    // 10-...py:200-257): exact casefold match -> positional (rank-
    // aligned within the adjective group, only for name-less rows) ->
    // unique-noun fallback (both residues unique) -> fuzzy best-match
    // on what remains. Each stage consumes anti-join residue only.
    "er_waterfall" -> ((s, d) => {
      val names = T.part(s, d).groupBy("p_name")
        .agg(min("p_partkey").as("mn"))
      val left = names.select(col("mn").as("lid"),
        col("p_name").as("lname"),
        lower(col("p_name")).as("lkey"),
        substring_index(col("p_name"), " ", 1).as("ladj"),
        substring_index(col("p_name"), " ", -1).as("lnoun"))
      val right = names.select((col("mn") + 100000).as("rid"),
        when(col("mn") % 4 === 0, col("p_name"))
          .when(col("mn") % 4 === 1, upper(col("p_name")))
          .when(col("mn") % 4 === 3, concat(col("p_name"), lit(" deluxe")))
          .otherwise(lit(null).cast("string")).as("rname"),
        substring_index(col("p_name"), " ", 1).as("radj0"),
        when(col("mn") % 4 === 3,
          substring_index(col("p_name"), " ", -1)).otherwise(lit(null))
          .as("rnoun"))
        .withColumn("rkey", lower(col("rname")))
        .withColumn("radj", when(col("rname").isNull, col("radj0")))
        .drop("radj0")
      EntityResolution.waterfall(left, "lid", right, "rid",
        Seq(
          MatchStage("exact", "lkey", "rkey"),
          MatchStage("positional", "ladj", "radj"),
          MatchStage("unique", "lnoun", "rnoun", uniqueOnly = true)),
        fuzzyNames = Some(("lname", "rname")), n = 3, theta = 0.5)
        .orderBy("lid")
    }),

    // Step-18 disambiguation flow (ref 18-...py:237-312): unique
    // candidates auto-assign, ambiguous ones consult the persisted
    // decisions table, the rest queue as PENDING rows.
    "dc_decision_flow" -> ((s, d) => {
      val cands = T.part(s, d).select(col("p_name").as("name"),
        col("p_brand").as("context"),
        col("p_size").cast("long").as("cand_id")).distinct()
      val decisions = T.part(s, d).groupBy("p_name", "p_brand")
        .agg(countDistinct("p_size").as("n"), min("p_partkey").as("mk"),
          min("p_size").as("ms"))
        .filter(col("n") > 1 && col("mk") % 2 === 0)
        .select(col("p_name").as("name"), col("p_brand").as("context"),
          col("ms").cast("long").as("assigned_id"))
      // single-pass classification — the union-of-two-outputs form ran
      // the whole candidate join once per branch
      Decisions.resolveAll(cands, decisions)
        .orderBy("name", "context")
    }),

    // Step-23 retirement flow (ref 23-retire-synthetic-mbids.py):
    // synthetic assignments retire to the real id only when exactly one
    // real candidate exists for the normalized name+context.
    "dc_retire_synthetic" -> ((s, d) => {
      val base = T.part(s, d).groupBy(col("p_name").as("name"),
        col("p_brand").as("context")).agg(min("p_partkey").as("mk"))
      val decisions = base.select(col("name"), col("context"),
        when(col("mk") % 2 === 0, concat(lit("synth:"), col("name")))
          .otherwise(concat(lit("mbid-"), col("mk"))).as("assigned_id"),
        lit("user").as("decision_source"))
      val real = base.filter(col("mk") % 3 =!= 0)
        .select(col("name"), col("context"),
          concat(lit("mb-"), col("mk")).as("real_id"))
        .unionByName(base.filter(col("mk") % 5 === 0)
          .select(col("name"), col("context"),
            concat(lit("mb2-"), col("mk")).as("real_id")))
      val (updated, _) = Decisions.retireSynthetic(decisions, real,
        c => c.startsWith("synth:"))
      updated.orderBy("name", "context")
    }),

    // Guarded comma split (ref 06-...py:457-527; UDF — oracle states
    // the expected output on this input, rules covered in FanoutSpec).
    "gs_guarded_split" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey"),
        array_join(Fanout.guardedSplitUdf(
          concat(col("c_name"), lit(", Jr and "), col("c_mktsegment"))),
          "|").as("parts"))
      .orderBy("c_custkey")),
  )

  val sql: Map[String, String] = Map(
    "fz_tf_cosine" ->
      """WITH names AS (SELECT DISTINCT lower(trim(p_name)) AS name
        |  FROM part WHERE lower(trim(p_name)) <> ''),
        |tf AS (SELECT name, g, COUNT(*) AS tf FROM (
        |  SELECT name, unnest(CASE WHEN length(name) < 3 THEN [name]
        |    ELSE [substr(name, x, 3) FOR x IN range(1, length(name) - 1)]
        |    END) AS g FROM names) GROUP BY name, g),
        |norms AS (SELECT name, sqrt(CAST(SUM(tf*tf) AS DOUBLE)) AS nrm
        |  FROM tf GROUP BY name),
        |cap AS (SELECT name, g, tf FROM (SELECT name, g, tf,
        |  COUNT(*) OVER (PARTITION BY g) AS df FROM tf) WHERE df <= 200),
        |dots AS (SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(SUM(a.tf*b.tf) AS BIGINT) AS dot
        |  FROM cap a JOIN cap b ON a.g = b.g AND a.name < b.name
        |  GROUP BY 1, 2)
        |SELECT name_a, name_b, cos FROM (
        |  SELECT name_a, name_b,
        |  ROUND(CAST(dot AS DOUBLE)/(na.nrm*nb.nrm), 6) AS cos
        |  FROM dots JOIN norms na ON name_a = na.name
        |  JOIN norms nb ON name_b = nb.name)
        |WHERE cos >= 0.5 ORDER BY name_a, name_b""".stripMargin,
    // Same inverted-index shape with sklearn-style smooth idf; the
    // 6-dp rounding on both engines absorbs double-accumulation-order
    // differences (~1e-15), making the tf-idf variant oracle-exact too.
    "fz_tfidf_cosine" ->
      """WITH names AS (SELECT DISTINCT lower(trim(p_name)) AS name
        |  FROM part WHERE lower(trim(p_name)) <> ''),
        |tf AS (SELECT name, g, COUNT(*) AS tf FROM (
        |  SELECT name, unnest(CASE WHEN length(name) < 3 THEN [name]
        |    ELSE [substr(name, x, 3) FOR x IN range(1, length(name) - 1)]
        |    END) AS g FROM names) GROUP BY name, g),
        |idf AS (SELECT g,
        |  ln((1.0 + (SELECT COUNT(*) FROM names)) / (1.0 + COUNT(*))) + 1.0
        |  AS idf FROM tf GROUP BY g),
        |w AS (SELECT name, tf.g, tf.tf * idf.idf AS w
        |  FROM tf JOIN idf ON tf.g = idf.g),
        |norms AS (SELECT name, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY name),
        |cap AS (SELECT name, g, w FROM (SELECT name, g, w,
        |  COUNT(*) OVER (PARTITION BY g) AS df FROM w) WHERE df <= 200),
        |dots AS (SELECT a.name AS name_a, b.name AS name_b,
        |  SUM(a.w*b.w) AS dot
        |  FROM cap a JOIN cap b ON a.g = b.g AND a.name < b.name
        |  GROUP BY 1, 2)
        |SELECT name_a, name_b, cos FROM (
        |  SELECT name_a, name_b,
        |  ROUND(dot/(na.nrm*nb.nrm), 6) AS cos
        |  FROM dots JOIN norms na ON name_a = na.name
        |  JOIN norms nb ON name_b = nb.name)
        |WHERE cos >= 0.6 ORDER BY name_a, name_b""".stripMargin,
    "dc_decision_flow" ->
      """WITH s AS (SELECT p_name AS name, p_brand AS context,
        |  COUNT(DISTINCT p_size) AS n, MIN(p_partkey) AS mk,
        |  MIN(p_size) AS ms FROM part GROUP BY 1, 2)
        |SELECT name, context,
        |CASE WHEN n = 1 THEN CAST(ms AS BIGINT)
        |     WHEN mk % 2 = 0 THEN CAST(ms AS BIGINT) END AS assigned_id,
        |CASE WHEN n = 1 THEN 'unique'
        |     WHEN mk % 2 = 0 THEN 'user_decision'
        |     ELSE 'pending' END AS source
        |FROM s ORDER BY name, context""".stripMargin,
    // real-candidate count per pair: one 'mb-' when mk%3<>0 plus one
    // 'mb2-' when mk%5=0 → unique only when exactly one of the two
    // conditions holds; min(real_id) picks 'mb-' over 'mb2-' when both
    // exist (but then the pair is ambiguous and never retires).
    "dc_retire_synthetic" ->
      """WITH s AS (SELECT p_name AS name, p_brand AS context,
        |  MIN(p_partkey) AS mk FROM part GROUP BY 1, 2),
        |e AS (SELECT name, context, mk,
        |  (CASE WHEN mk % 3 <> 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN mk % 5 = 0 THEN 1 ELSE 0 END) AS nr,
        |  CASE WHEN mk % 3 <> 0 THEN 'mb-' || CAST(mk AS VARCHAR)
        |       WHEN mk % 5 = 0 THEN 'mb2-' || CAST(mk AS VARCHAR) END AS rid
        |  FROM s)
        |SELECT name, context,
        |CASE WHEN mk % 2 = 0 AND nr = 1 THEN rid
        |     WHEN mk % 2 = 0 THEN 'synth:' || name
        |     ELSE 'mbid-' || CAST(mk AS VARCHAR) END AS assigned_id,
        |CASE WHEN mk % 2 = 0 AND nr = 1 THEN 'retired_to_real'
        |     ELSE 'user' END AS decision_source
        |FROM e ORDER BY name, context""".stripMargin,
    // Full waterfall restated: staged CTEs with rank-aligned joins,
    // NOT-IN residues, a both-sides-unique noun stage, and the same
    // 3-gram cosine best-match (integer dots, 6-dp rounding) on the
    // final residues only.
    "er_waterfall" ->
      """WITH names AS (SELECT p_name, MIN(p_partkey) AS mn FROM part GROUP BY p_name),
        |l AS (SELECT mn AS lid, p_name AS lname, lower(p_name) AS lkey,
        |  string_split(p_name, ' ')[1] AS ladj,
        |  string_split(p_name, ' ')[-1] AS lnoun FROM names),
        |r AS (SELECT mn + 100000 AS rid,
        |  CASE WHEN mn % 4 = 0 THEN p_name WHEN mn % 4 = 1 THEN upper(p_name)
        |       WHEN mn % 4 = 3 THEN p_name || ' deluxe' END AS rname,
        |  CASE WHEN mn % 4 = 2 THEN string_split(p_name, ' ')[1] END AS radj,
        |  CASE WHEN mn % 4 = 3 THEN string_split(p_name, ' ')[-1] END AS rnoun
        |  FROM names),
        |rr AS (SELECT rid, rname, lower(rname) AS rkey, radj, rnoun FROM r),
        |s1l AS (SELECT lid, lkey, ROW_NUMBER() OVER (PARTITION BY lkey ORDER BY lid) AS rn
        |  FROM l WHERE lkey IS NOT NULL),
        |s1r AS (SELECT rid, rkey, ROW_NUMBER() OVER (PARTITION BY rkey ORDER BY rid) AS rn
        |  FROM rr WHERE rkey IS NOT NULL),
        |s1 AS (SELECT lid, rid FROM s1l JOIN s1r ON lkey = rkey AND s1l.rn = s1r.rn),
        |l1 AS (SELECT * FROM l WHERE lid NOT IN (SELECT lid FROM s1)),
        |r1 AS (SELECT * FROM rr WHERE rid NOT IN (SELECT rid FROM s1)),
        |s2l AS (SELECT lid, ladj, ROW_NUMBER() OVER (PARTITION BY ladj ORDER BY lid) AS rn
        |  FROM l1 WHERE ladj IS NOT NULL),
        |s2r AS (SELECT rid, radj, ROW_NUMBER() OVER (PARTITION BY radj ORDER BY rid) AS rn
        |  FROM r1 WHERE radj IS NOT NULL),
        |s2 AS (SELECT lid, rid FROM s2l JOIN s2r ON ladj = radj AND s2l.rn = s2r.rn),
        |l2 AS (SELECT * FROM l1 WHERE lid NOT IN (SELECT lid FROM s2)),
        |r2 AS (SELECT * FROM r1 WHERE rid NOT IN (SELECT rid FROM s2)),
        |s3l AS (SELECT lid, lnoun FROM (SELECT lid, lnoun,
        |  COUNT(*) OVER (PARTITION BY lnoun) AS c FROM l2 WHERE lnoun IS NOT NULL)
        |  WHERE c = 1),
        |s3r AS (SELECT rid, rnoun FROM (SELECT rid, rnoun,
        |  COUNT(*) OVER (PARTITION BY rnoun) AS c FROM r2 WHERE rnoun IS NOT NULL)
        |  WHERE c = 1),
        |s3 AS (SELECT lid, rid FROM s3l JOIN s3r ON lnoun = rnoun),
        |l3 AS (SELECT * FROM l2 WHERE lid NOT IN (SELECT lid FROM s3)),
        |r3 AS (SELECT * FROM r2 WHERE rid NOT IN (SELECT rid FROM s3)),
        |lt AS (SELECT lid, lower(trim(lname)) AS nm FROM l3
        |  WHERE lower(trim(lname)) <> ''),
        |rt AS (SELECT rid, lower(trim(rname)) AS nm FROM r3
        |  WHERE rname IS NOT NULL AND lower(trim(rname)) <> ''),
        |ltf AS (SELECT lid, g, COUNT(*) AS tf FROM (
        |  SELECT lid, unnest(CASE WHEN length(nm) < 3 THEN [nm]
        |    ELSE [substr(nm, x, 3) FOR x IN range(1, length(nm) - 1)] END) AS g
        |  FROM lt) GROUP BY lid, g),
        |rtf AS (SELECT rid, g, COUNT(*) AS tf FROM (
        |  SELECT rid, unnest(CASE WHEN length(nm) < 3 THEN [nm]
        |    ELSE [substr(nm, x, 3) FOR x IN range(1, length(nm) - 1)] END) AS g
        |  FROM rt) GROUP BY rid, g),
        |lnorm AS (SELECT lid, sqrt(CAST(SUM(tf*tf) AS DOUBLE)) AS na
        |  FROM ltf GROUP BY lid),
        |rnorm AS (SELECT rid, sqrt(CAST(SUM(tf*tf) AS DOUBLE)) AS nb
        |  FROM rtf GROUP BY rid),
        |dots AS (SELECT lid, rid, SUM(a.tf*b.tf) AS dot
        |  FROM ltf a JOIN rtf b ON a.g = b.g GROUP BY lid, rid),
        |fz AS (SELECT lid, rid, score FROM (SELECT lid, rid, score,
        |  ROW_NUMBER() OVER (PARTITION BY lid ORDER BY score DESC, rid) AS rk
        |  FROM (SELECT lid, rid, ROUND(CAST(dot AS DOUBLE)/(na*nb), 6) AS score
        |    FROM dots JOIN lnorm USING (lid) JOIN rnorm USING (rid))
        |  WHERE score >= 0.5) WHERE rk = 1)
        |SELECT * FROM (
        |  SELECT lid, rid, 'exact' AS stage, CAST(1.0 AS DOUBLE) AS score FROM s1
        |  UNION ALL SELECT lid, rid, 'positional', CAST(1.0 AS DOUBLE) FROM s2
        |  UNION ALL SELECT lid, rid, 'unique', CAST(1.0 AS DOUBLE) FROM s3
        |  UNION ALL SELECT lid, rid, 'fuzzy', score FROM fz)
        |ORDER BY lid""".stripMargin,
    // The guarded split's output on this packed input is exactly
    // "<name>, Jr|<segment>": ' and ' splits the two halves, and the
    // comma before the guarded suffix 'Jr' re-attaches. The oracle
    // states that expected output directly; the rule engine itself is
    // property-tested in FanoutSpec.
    "gs_guarded_split" ->
      """SELECT c_custkey, c_name || ', Jr|' || c_mktsegment AS parts
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fan_out" ->
      """SELECT s_suppkey,
        |CASE WHEN instr(seg, ':') > 0
        |  THEN trim(string_split(seg, ':')[1]) ELSE NULL END AS role,
        |trim(CASE WHEN instr(seg, ':') > 0
        |  THEN string_split(seg, ':')[-1] ELSE seg END) AS person
        |FROM (SELECT s_suppkey, unnest(list_filter(string_split(
        |  'supp:' || s_name || ';cc:' || CAST(s_nationkey AS VARCHAR), ';'),
        |  x -> trim(x) <> '')) AS seg FROM supplier)
        |ORDER BY s_suppkey, role""".stripMargin,
  )
}
