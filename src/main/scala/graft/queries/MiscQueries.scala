package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.operators.{Fanout, Fuzzy}

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
