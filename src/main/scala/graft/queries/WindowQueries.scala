package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Tables => T}

/** Window operators W1-W4, sorts/top-k (§2.6) and set ops (§2.7).
  * Ranking windows only — mirrors the reference, which never uses frame
  * specs. Every window carries a total order (explicit tie-breaker
  * columns) so results survive Spark's unordered shuffles — SURVEY §7.4
  * risk 1.
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // W1: row_number dedup / latest per key (ref emit_contributors
    // .py:1095-1125).
    "w1_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      T.orders(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("last_dt"))
        .orderBy("o_custkey")
    }),

    // W2: best + runner-up with margin (ref 22-...py:1335-1401).
    "w2_best_runnerup" -> ((s, d) => {
      val tp = T.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        Exprs.cents(col("o_totalprice")).as("tp"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("tp").desc, col("o_orderkey"))
      tp.withColumn("rn", row_number().over(w))
        .withColumn("runner", lead(col("tp"), 1).over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("tp").as("best"), col("runner"),
          (col("tp") - col("runner")).as("margin"))
        .orderBy("o_custkey")
    }),

    // W3: first non-null per group in a defined order (ref 05-...py:191-193).
    // `ts` is long nanos (nanosAsLong read) — ordering is exact.
    "w3_first_nonnull" -> ((s, d) => {
      val v = T.events(s, d).withColumn("v",
        when(col("value") < 50, lit(null))
          .otherwise(Exprs.cents(col("value"))))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      v.filter(col("v").isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("v").as("first_big_cents"))
        .orderBy("user_id")
    }),

    // W4: latest-run lookup (ref tm_snapshots.py:109-132).
    "w4_latest_run" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      T.events(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id"),
          expr("ts div 1000000000").as("epoch_s"))
        .orderBy("event_type")
    }),

    // §2.6: top-N via sort + limit (Spark plans TakeOrderedAndProject).
    "topk_orders" -> ((s, d) => T.orders(s, d)
      .select(col("o_orderkey"), Exprs.cents(col("o_totalprice")).as("tp_cents"))
      .orderBy(col("tp_cents").desc, col("o_orderkey"))
      .limit(15)),

    // Per-group top-k via the bounded typed Aggregator — only k-sized
    // partial buffers cross the shuffle, vs the window form shipping
    // and sorting every row (the oracle IS that window form).
    "w5_topk_group" -> ((s, d) => {
      val o = T.orders(s, d).select(col("o_orderpriority"),
        Exprs.cents(col("o_totalprice")).as("price_cents"),
        col("o_orderkey"))
      graft.operators.TopK.topKPerGroup(o, Seq("o_orderpriority"),
          "price_cents", "o_orderkey", k = 5)
        .orderBy("o_orderpriority", "rank")
    }),

    // String-keyed per-group top-k on the same bounded-buffer path
    // (generalized Entry id — round-6 advice): top tokens per language
    // without a window sort OR a global top-N limit.
    "w6_topk_tokens" -> ((s, d) => {
      val toks = T.documents(s, d)
        .select(col("lang"),
          explode(graft.operators.TextAnalysis.wordTokens(col("text")))
            .as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      graft.operators.TopK.topKPerGroupAs[String](toks, Seq("lang"),
          "cnt", "tok", k = 5)
        .orderBy("lang", "rank")
    }),

    // §2.7: union + distinct.
    "set_union" -> ((s, d) => T.customer(s, d)
      .select(col("c_nationkey").as("nk"))
      .union(T.supplier(s, d).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")),

    // §2.7: intersect.
    "set_intersect" -> ((s, d) => T.part(s, d).select(col("p_partkey").as("pk"))
      .intersect(T.lineitem(s, d).select(col("l_partkey").as("pk")))
      .orderBy("pk")),

    // §2.7: except (set subtraction).
    "set_except" -> ((s, d) => T.customer(s, d)
      .select(col("c_custkey").as("ck"))
      .except(T.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("ck")))
      .orderBy("ck")),
  )

  val sql: Map[String, String] = Map(
    "w1_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_dt
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w2_best_runnerup" ->
      """SELECT o_custkey, tp AS best, runner, tp - runner AS margin FROM (
        |SELECT o_custkey, tp,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY tp DESC, o_orderkey) AS rn,
        |LEAD(tp, 1) OVER (PARTITION BY o_custkey
        |  ORDER BY tp DESC, o_orderkey) AS runner
        |FROM (SELECT o_custkey, o_orderkey,
        |CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp FROM orders))
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w3_first_nonnull" ->
      """SELECT user_id, v AS first_big_cents FROM (
        |SELECT user_id, v, ROW_NUMBER() OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id) AS rn FROM (
        |SELECT user_id, ts, event_id,
        |CASE WHEN value < 50 THEN NULL
        |  ELSE CAST(ROUND(value*100) AS BIGINT) END AS v FROM events)
        |WHERE v IS NOT NULL)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w4_latest_run" ->
      """SELECT event_type, event_id,
        |CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s FROM (
        |SELECT event_type, event_id, ts,
        |ROW_NUMBER() OVER (PARTITION BY event_type
        |  ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents
        |FROM orders ORDER BY tp_cents DESC, o_orderkey LIMIT 15""".stripMargin,
    "w5_topk_group" ->
      """SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank, o_orderkey,
        |  price_cents FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC,
        |        o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 5 ORDER BY o_orderpriority, rank""".stripMargin,
    "w6_topk_tokens" ->
      """SELECT lang, CAST(rank AS BIGINT) AS rank, tok, cnt FROM (
        |  SELECT lang, tok, cnt,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, tok) AS rank
        |  FROM (SELECT lang, tok, COUNT(*) AS cnt FROM (
        |    SELECT lang, unnest(list_filter(
        |      string_split_regex(text, '\s+'), t -> t <> '')) AS tok
        |    FROM documents) GROUP BY lang, tok))
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "set_union" ->
      """SELECT nk FROM (SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier) ORDER BY nk""".stripMargin,
    "set_intersect" ->
      """SELECT pk FROM (SELECT p_partkey AS pk FROM part
        |INTERSECT SELECT l_partkey AS pk FROM lineitem) ORDER BY pk""".stripMargin,
    "set_except" ->
      """SELECT ck FROM (SELECT c_custkey AS ck FROM customer
        |EXCEPT SELECT c_custkey AS ck FROM customer WHERE c_acctbal > 0)
        |ORDER BY ck""".stripMargin,
  )
}
