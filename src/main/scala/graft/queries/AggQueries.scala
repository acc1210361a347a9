package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Tables => T}
import graft.operators.TextAnalysis

/** Aggregation operators A1-A18 (SURVEY §2.4), re-expressed over the
  * driver testdata. Every query is a single hash aggregation (Spark
  * plans partial+final automatically — map-side combine), ends in a
  * total-order sort for engine-deterministic output, and avoids raw
  * double sums (money → integer cents via [[Exprs.cents]]).
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Flagship TPC-H-Q1-style pricing summary.
    "q1_pricing_summary" -> ((s, d) => T.lineitem(s, d)
      .filter(col("l_quantity") > 5)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(Exprs.cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_cents"),
        count(lit(1)).as("count_order"),
        (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")),

    // A1: per-group count / countDistinct (≙ per-folder artist counts,
    // ref scripts/pipeline/12-...py:63-68).
    "a1_group_countdistinct" -> ((s, d) => T.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        min(col("o_orderdate").cast("date")).as("first_order"))
      .orderBy("o_custkey")),

    // A2: per-album disc analysis shape (ref 13-...py:92-104).
    "a2_disc_analysis" -> ((s, d) => T.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        sum(when(col("l_tax") > 0.04, 1).otherwise(0)).as("n_taxed"))
      .orderBy("l_orderkey")),

    // A3: coverage conditional-sum fan-out (ref tm_snapshots.py:157-218).
    "a3_coverage" -> ((s, d) => T.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") > 200, 1).otherwise(0)).as("n_long"),
        sum(when(col("lang") === "en", 1).otherwise(0)).as("n_en"))
      .withColumn("long_share",
        col("n_long").cast("double") / col("n_docs"))
      .orderBy("source")),

    // A4: duplicate detection HAVING count>1 (ref 96-...py:184-219).
    "a4_dup_having" -> ((s, d) => T.lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("l_partkey", "l_suppkey")),

    // A5: group content signature (ref folder signature 97-...py:9-22).
    "a5_group_signature" -> ((s, d) => T.orders(s, d)
      .groupBy("o_custkey")
      .agg(array_join(
        transform(array_sort(collect_list(col("o_orderkey"))),
          _.cast("string")), "|").as("sig"))
      .orderBy("o_custkey")),

    // A6: mode per group via row_number over count desc (ref
    // 92-library-insights.py:176-199).
    "a6_mode_per_group" -> ((s, d) => {
      val counts = T.orders(s, d)
        .groupBy("o_custkey", "o_orderpriority").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("n").desc, col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderpriority").as("mode_prio"),
          col("n"))
        .orderBy("o_custkey")
    }),

    // A7: rollup stats (ref album rollup 92-...py:796-806).
    "a7_rollup_stats" -> ((s, d) => T.orders(s, d)
      .select(col("o_custkey"), Exprs.cents(col("o_totalprice")).as("tp"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(col("tp")).as("sum_cents"),
        max(col("tp")).as("max_cents"),
        (sum(col("tp")).cast("double") / count(lit(1))).as("avg_cents"))
      .orderBy("o_custkey")),

    // Long→wide pivot with an EXPLICIT value list — at scale the value
    // scan pivot() otherwise runs (collect distinct to the driver) is
    // the anti-pattern; pinned values keep it one pass, map-side
    // combinable (the inverse of f_unpivot).
    "a19_pivot_wide" -> ((s, d) => T.customer(s, d)
      .groupBy(col("c_nationkey"))
      .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
        "HOUSEHOLD", "MACHINERY"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("c_nationkey")),

    // ROLLUP: per-priority rows plus the grand total in ONE aggregation
    // pass (Expand), not a union of two scans; the super-aggregate row
    // is identified by grouping(), not coalesce — a genuine NULL
    // priority group stays distinguishable from the grand total
    // (round-6 advice: the coalesce form conflated them).
    "a20_rollup_totals" -> ((s, d) => T.orders(s, d)
      .select(col("o_orderpriority"), Exprs.cents(col("o_totalprice")).as("tp"))
      .rollup(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("tp")).as("sum_cents"),
        grouping(col("o_orderpriority")).as("__g"))
      .select(when(col("__g") === 1, lit("TOTAL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("sum_cents"))
      .orderBy("priority")),

    // A8: quantile / median / spread (ref 92-...py:1290-1299). Integer
    // cents input ⇒ interpolated quantiles are exact in double; 0.25 /
    // 0.75 are binary-exact fractions.
    "a8_quantile_spread" -> ((s, d) => T.orders(s, d)
      .select(col("o_orderpriority"), Exprs.cents(col("o_totalprice")).as("tp"))
      .groupBy("o_orderpriority")
      .agg(expr("percentile(tp, 0.5)").as("med"),
        expr("percentile(tp, 0.25)").as("q1"),
        expr("percentile(tp, 0.75)").as("q3"))
      .withColumn("spread", col("q3") - col("q1"))
      .orderBy("o_orderpriority")),

    // A9: min-timestamp rollup + decade arithmetic (ref 92-...py:838-849).
    "a9_min_ts_rollup" -> ((s, d) => T.orders(s, d)
      .groupBy("o_custkey")
      .agg(min(col("o_orderdate").cast("date")).as("first_dt"))
      .withColumn("yr", year(col("first_dt")))
      .withColumn("decade", (col("yr") - pmod(col("yr"), lit(10))))
      .orderBy("o_custkey")),

    // A10: explode + top-N token counts (ref 92-...py:1939, ~15× reuse).
    "a10_topn_tokens" -> ((s, d) => T.documents(s, d)
      .select(explode(TextAnalysis.wordTokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(20)),

    // A11: co-occurrence pair counts (ref 92-...py:2507, tm_graph.py:294).
    "a11_cooccur_pairs" -> ((s, d) => {
      val m = T.events(s, d).select(col("user_id"), col("event_type")).distinct()
      m.as("a").join(m.as("b"),
          col("a.user_id") === col("b.user_id")
            && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("n"))
        .orderBy("t1", "t2")
    }),

    // A12: track-sequence audit aggregate (ref 93-...py:213-247).
    "a12_seq_audit" -> ((s, d) => T.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_linenumber")).as("n_uniq"),
        max(col("l_linenumber")).as("mx"))
      .withColumn("n_dup", col("n") - col("n_uniq"))
      .withColumn("n_missing", col("mx") - col("n_uniq"))
      .orderBy("l_orderkey")),

    // A13: gap detection via sequence + array_except (ref 93-...py:249-259).
    "a13_gap_detect" -> ((s, d) => T.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(max(col("l_linenumber")).as("mx"),
        collect_set(col("l_linenumber")).as("present"))
      .withColumn("missing", array_join(
        transform(array_sort(array_except(
          sequence(lit(1), col("mx")), col("present"))), _.cast("string")),
        ","))
      .filter(col("missing") =!= "")
      .select("l_orderkey", "missing")
      .orderBy("l_orderkey")),

    // A14: multi-value distinct count per group (ref 95-...py:209-251).
    "a14_mv_distinct" -> ((s, d) => T.documents(s, d)
      .groupBy("source")
      .agg(countDistinct(col("lang")).as("n_langs"))
      .withColumn("multi", col("n_langs") > 1)
      .orderBy("source")),

    // A16: name-collision split HAVING=1 vs >1 (ref emit_contributors
    // .py:215-271).
    "a16_collision_split" -> ((s, d) => T.lineitem(s, d)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .withColumn("cls",
        when(col("n") === 1, lit("unique")).otherwise(lit("collision")))
      .orderBy("l_partkey")),

    // A17: similarity-cluster group stats shape (ref 15-...py:347-375).
    "a17_cluster_stats" -> ((s, d) => T.embeddings(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("n_members"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
      .orderBy("label")),

    // A18: scalar denominators (ref 92-report-library-health.py:363-407).
    "a18_scalar_denoms" -> ((s, d) => T.lineitem(s, d)
      .agg(count(lit(1)).as("n_li"),
        countDistinct(col("l_orderkey")).as("n_ord_in_li"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .crossJoin(T.orders(s, d).agg(count(lit(1)).as("n_orders")))),
  )

  val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |COUNT(*) AS count_order,
        |CAST(SUM(l_quantity) AS DOUBLE)/COUNT(*) AS avg_qty
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_group_countdistinct" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |COUNT(DISTINCT o_orderpriority) AS n_prio,
        |CAST(MIN(o_orderdate) AS DATE) AS first_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a2_disc_analysis" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines,
        |COUNT(DISTINCT l_suppkey) AS n_supp,
        |CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a3_coverage" ->
      """SELECT source, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
        |CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |CAST(SUM(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS long_share
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "a4_dup_having" ->
      """SELECT l_partkey, l_suppkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_partkey, l_suppkey HAVING COUNT(*) > 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "a5_group_signature" ->
      """SELECT o_custkey, array_to_string(list_transform(
        |list_sort(list(o_orderkey)), x -> CAST(x AS VARCHAR)), '|') AS sig
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a6_mode_per_group" ->
      """SELECT o_custkey, mode_prio, n FROM (
        |SELECT o_custkey, o_orderpriority AS mode_prio, COUNT(*) AS n,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |FROM orders GROUP BY o_custkey, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "a7_rollup_stats" ->
      """SELECT o_custkey, COUNT(*) AS n,
        |CAST(SUM(tp) AS BIGINT) AS sum_cents, MAX(tp) AS max_cents,
        |CAST(SUM(tp) AS DOUBLE)/COUNT(*) AS avg_cents
        |FROM (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
        |FROM orders) GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a19_pivot_wide" ->
      """SELECT c_nationkey,
        |CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS "AUTOMOBILE",
        |CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS "BUILDING",
        |CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS "FURNITURE",
        |CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS "HOUSEHOLD",
        |CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
        |  AS BIGINT) AS "MACHINERY"
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "a20_rollup_totals" ->
      """SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'TOTAL'
        |  ELSE o_orderpriority END AS priority,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |  AS sum_cents
        |FROM orders GROUP BY ROLLUP(o_orderpriority)
        |ORDER BY priority NULLS FIRST""".stripMargin,
    "a8_quantile_spread" ->
      """SELECT o_orderpriority,
        |CAST(quantile_cont(tp, 0.5) AS DOUBLE) AS med,
        |CAST(quantile_cont(tp, 0.25) AS DOUBLE) AS q1,
        |CAST(quantile_cont(tp, 0.75) AS DOUBLE) AS q3,
        |CAST(quantile_cont(tp, 0.75) AS DOUBLE)
        |  - CAST(quantile_cont(tp, 0.25) AS DOUBLE) AS spread
        |FROM (SELECT o_orderpriority,
        |CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a9_min_ts_rollup" ->
      """SELECT o_custkey, first_dt, yr, yr - (yr % 10) AS decade FROM (
        |SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS first_dt,
        |CAST(year(MIN(o_orderdate)) AS INT) AS yr
        |FROM orders GROUP BY o_custkey) ORDER BY o_custkey""".stripMargin,
    "a10_topn_tokens" ->
      """SELECT tok, COUNT(*) AS n FROM (
        |SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    "a11_cooccur_pairs" ->
      """WITH m AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n
        |FROM m a JOIN m b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY t1, t2""".stripMargin,
    "a12_seq_audit" ->
      """SELECT l_orderkey, COUNT(*) AS n,
        |COUNT(DISTINCT l_linenumber) AS n_uniq, MAX(l_linenumber) AS mx,
        |COUNT(*) - COUNT(DISTINCT l_linenumber) AS n_dup,
        |MAX(l_linenumber) - COUNT(DISTINCT l_linenumber) AS n_missing
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a13_gap_detect" ->
      """SELECT l_orderkey, missing FROM (
        |SELECT l_orderkey, array_to_string(list_transform(
        |  list_filter(generate_series(1, mx), x -> NOT list_contains(present, x)),
        |  x -> CAST(x AS VARCHAR)), ',') AS missing
        |FROM (SELECT l_orderkey, MAX(l_linenumber) AS mx,
        |  list_distinct(list(l_linenumber)) AS present
        |  FROM lineitem GROUP BY l_orderkey))
        |WHERE missing <> '' ORDER BY l_orderkey""".stripMargin,
    "a14_mv_distinct" ->
      """SELECT source, COUNT(DISTINCT lang) AS n_langs,
        |COUNT(DISTINCT lang) > 1 AS multi
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "a16_collision_split" ->
      """SELECT l_partkey, COUNT(*) AS n,
        |CASE WHEN COUNT(*) = 1 THEN 'unique' ELSE 'collision' END AS cls
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "a17_cluster_stats" ->
      """SELECT label, COUNT(*) AS n_members, MIN(vec_id) AS min_id,
        |MAX(vec_id) AS max_id
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "a18_scalar_denoms" ->
      """SELECT (SELECT COUNT(*) FROM lineitem) AS n_li,
        |(SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_ord_in_li,
        |(SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS n_supp,
        |(SELECT COUNT(*) FROM orders) AS n_orders""".stripMargin,
  )
}
