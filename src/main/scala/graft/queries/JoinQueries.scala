package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Join operators J1-J11 + incremental-scan set semantics S7-S9
  * (SURVEY §2.3 / §2.1). All reference joins are equi-joins with a small
  * side → the Spark plans broadcast the dimension (`broadcast()` is
  * explicit where the small side is known a priori); the fact side never
  * shuffles for broadcast joins, which is the 100 TB-safe shape.
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // J1: broadcast dict lookup (ref 06-...py:729-779).
    "j1_broadcast_lookup" -> ((s, d) => T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand", "p_type")
      // (l_orderkey, l_linenumber) is not unique in the testdata —
      // order by every output column so emit order is total.
      .orderBy("l_orderkey", "l_linenumber", "p_brand", "p_type")),

    // J2: left-join enrichment chain (ref 11-...py:416-425).
    "j2_left_enrich" -> ((s, d) => T.customer(s, d)
      .join(broadcast(T.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(T.region(s, d)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")),

    // J3: self-join majority-vote propagation (ref 05-...py:97-213):
    // vote the modal brand per type, apply back to every part.
    "j3_majority_vote" -> ((s, d) => {
      val counts = T.part(s, d).groupBy("p_type", "p_brand")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("p_type")
        .orderBy(col("n").desc, col("p_brand"))
      val mode = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("p_type"),
          col("p_brand").as("brand_mode"))
      T.part(s, d).join(broadcast(mode), Seq("p_type"))
        .select("p_partkey", "p_type", "brand_mode")
        .orderBy("p_partkey")
    }),

    // J4: album-scope co-occurrence join (ref tm_graph.py:524-533).
    "j4_cooccur_join" -> ((s, d) => {
      val m = T.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      m.as("a").join(m.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_suppkey") < col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("s1"), col("b.l_suppkey").as("s2"))
        .agg(count(lit(1)).as("n"))
        .orderBy("s1", "s2")
    }),

    // J5: cross-DB join on unique key (ref 98-sync-...py:175-217):
    // CTE of keys with COUNT(*)=1, then join.
    "j5_unique_key_join" -> ((s, d) => {
      val single = T.lineitem(s, d).groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), min(col("l_partkey")).as("the_part"))
        .filter(col("n") === 1)
      T.orders(s, d).join(single, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("tp_cents"),
          col("the_part"))
        .orderBy("o_orderkey")
    }),

    // J6: anti-join set subtraction (ref emit_contributors.py:1066-1131).
    "j6_anti_join" -> ((s, d) => T.orders(s, d)
      .join(T.lineitem(s, d).filter(col("l_discount") > 0.08),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey")
      .orderBy("o_orderkey")),

    // J7: semi-join scoping (ref 98-create-export-db.py:313-320).
    "j7_semi_join" -> ((s, d) => T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")),

    // J8: positional rank-aligned 1:1 join (ref emit_contributors
    // .py:1095-1125): row_number both sides, join on (key, rn).
    "j8_positional_join" -> ((s, d) => {
      val c = T.customer(s, d)
        .select(col("c_nationkey").as("nk"), col("c_custkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("nk").orderBy("c_custkey")))
      val su = T.supplier(s, d)
        .select(col("s_nationkey").as("nk"), col("s_suppkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("nk").orderBy("s_suppkey")))
      c.join(su, Seq("nk", "rn"))
        .select("nk", "rn", "c_custkey", "s_suppkey")
        .orderBy("nk", "rn")
    }),

    // J9: unique-name fallback match (ref emit_contributors.py:1920-1976).
    "j9_unique_match" -> ((s, d) => {
      val uniq = T.lineitem(s, d).groupBy("l_partkey")
        .agg(count(lit(1)).as("n")).filter(col("n") === 1)
      uniq.join(T.part(s, d), col("l_partkey") === col("p_partkey"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // J10: broadcast map probe with synthetic fallback (ref 18-...py:142-173).
    "j10_map_coalesce" -> ((s, d) => {
      val dict = T.supplier(s, d).filter(col("s_suppkey") < 50)
        .select(col("s_suppkey"), col("s_name"))
      T.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_suppkey")
        .join(broadcast(dict), col("l_suppkey") === col("s_suppkey"), "left")
        .withColumn("resolved",
          coalesce(col("s_name"), concat(lit("SYN#"), col("l_suppkey"))))
        .select("l_orderkey", "l_linenumber", "resolved")
        .orderBy("l_orderkey", "l_linenumber", "resolved")
    }),

    // J11: batched IN-probe lookups → a plain semi join in Spark
    // (ref tm_db.py:561-577 — the chunking is a SQLite artifact).
    "j11_in_probe" -> ((s, d) => T.orders(s, d)
      .join(T.customer(s, d).filter(col("c_acctbal") > 5000)
        .select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
      .orderBy("o_orderkey")),

    // S7: incremental new-rows anti-join (ref tags2db.py:955-977).
    "s7_new_anti" -> ((s, d) => T.part(s, d)
      .join(T.lineitem(s, d).filter(col("l_quantity") > 45),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey")
      .orderBy("p_partkey")),

    // S8: modified-rows semi-join on a timestamp condition
    // (ref tags2db.py:980-1019).
    "s8_modified_semi" -> ((s, d) => T.orders(s, d)
      .join(T.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey")
          && datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")) > 100, "left_semi")
      .select("o_orderkey")
      .orderBy("o_orderkey")),

    // S9: orphan pruning set difference (ref tags2db.py:1022-1079).
    "s9_prune_orphans" -> ((s, d) => T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")),
  )

  val sql: Map[String, String] = Map(
    "j1_broadcast_lookup" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_type
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_brand, p_type""".stripMargin,
    "j2_left_enrich" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "j3_majority_vote" ->
      """WITH mode AS (SELECT p_type, brand_mode FROM (
        |SELECT p_type, p_brand AS brand_mode,
        |ROW_NUMBER() OVER (PARTITION BY p_type
        |  ORDER BY COUNT(*) DESC, p_brand) AS rn
        |FROM part GROUP BY p_type, p_brand) WHERE rn = 1)
        |SELECT p_partkey, p.p_type, brand_mode
        |FROM part p JOIN mode m ON p.p_type = m.p_type
        |ORDER BY p_partkey""".stripMargin,
    "j4_cooccur_join" ->
      """WITH m AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, COUNT(*) AS n
        |FROM m a JOIN m b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_suppkey < b.l_suppkey
        |GROUP BY 1, 2 ORDER BY s1, s2""".stripMargin,
    "j5_unique_key_join" ->
      """WITH single AS (SELECT l_orderkey, MIN(l_partkey) AS the_part
        |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) = 1)
        |SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents,
        |the_part FROM orders JOIN single ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "j6_anti_join" ->
      """SELECT o_orderkey FROM orders WHERE NOT EXISTS (
        |SELECT 1 FROM lineitem
        |WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |ORDER BY o_orderkey""".stripMargin,
    "j7_semi_join" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (
        |SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "j8_positional_join" ->
      """WITH c AS (SELECT c_nationkey AS nk, c_custkey,
        |ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |FROM customer),
        |s AS (SELECT s_nationkey AS nk, s_suppkey,
        |ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
        |FROM supplier)
        |SELECT c.nk AS nk, c.rn AS rn, c_custkey, s_suppkey
        |FROM c JOIN s ON c.nk = s.nk AND c.rn = s.rn
        |ORDER BY c.nk, c.rn""".stripMargin,
    "j9_unique_match" ->
      """SELECT p_partkey, p_name FROM part JOIN (
        |SELECT l_partkey FROM lineitem GROUP BY l_partkey
        |HAVING COUNT(*) = 1) u ON u.l_partkey = p_partkey
        |ORDER BY p_partkey""".stripMargin,
    "j10_map_coalesce" ->
      """SELECT l_orderkey, l_linenumber,
        |COALESCE(s_name, 'SYN#' || CAST(l_suppkey AS VARCHAR)) AS resolved
        |FROM lineitem LEFT JOIN (
        |SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey < 50) d
        |ON l_suppkey = d.s_suppkey
        |ORDER BY l_orderkey, l_linenumber, resolved""".stripMargin,
    "j11_in_probe" ->
      """SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY o_orderkey""".stripMargin,
    "s7_new_anti" ->
      """SELECT p_partkey FROM part WHERE NOT EXISTS (
        |SELECT 1 FROM lineitem
        |WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,
    "s8_modified_semi" ->
      """SELECT o_orderkey FROM orders WHERE EXISTS (
        |SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |AND date_diff('day', CAST(o_orderdate AS DATE),
        |  CAST(l_shipdate AS DATE)) > 100)
        |ORDER BY o_orderkey""".stripMargin,
    "s9_prune_orphans" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS (
        |SELECT 1 FROM orders
        |WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
  )
}
