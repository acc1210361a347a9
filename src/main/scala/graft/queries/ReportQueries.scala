package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.reports.Insights

/** Dashboard/report branches (SURVEY §3.3): one cached base frame
  * feeding independent aggregation branches — the 92-library-insights
  * shape with result tables instead of HTML.
  */
object ReportQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "rp_kpis" -> ((s, d) => Insights.kpis(Insights.base(s, d))),
    "rp_yearly" -> ((s, d) => Insights.yearlyTrends(Insights.base(s, d))),
    "rp_priority_mix" -> ((s, d) => Insights.priorityMix(Insights.base(s, d))),
    // one-pass column profile of orders (the 96-sanity-report shape)
    "rp_profile" -> ((s, d) =>
      graft.operators.Profile.profile(graft.core.Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
        .orderBy("col_name")),
  )

  val sql: Map[String, String] = Map(
    "rp_kpis" ->
      """SELECT COUNT(*) AS n_orders,
        |COUNT(DISTINCT o_custkey) AS n_customers,
        |CAST(SUM(tp) AS BIGINT) AS revenue_cents,
        |CAST(SUM(tp) AS DOUBLE)/COUNT(*) AS avg_order_cents,
        |CAST(MIN(yr) AS INT) AS first_yr, CAST(MAX(yr) AS INT) AS last_yr
        |FROM (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp,
        |CAST(year(o_orderdate) AS INT) AS yr FROM orders)""".stripMargin,
    "rp_yearly" ->
      """SELECT yr, COUNT(*) AS n, CAST(SUM(tp) AS BIGINT) AS revenue_cents,
        |COUNT(DISTINCT o_custkey) AS n_customers
        |FROM (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp,
        |CAST(year(o_orderdate) AS INT) AS yr FROM orders)
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "rp_priority_mix" ->
      """SELECT o_orderpriority, n,
        |CAST(n AS DOUBLE) / SUM(n) OVER () AS share FROM (
        |SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1)
        |ORDER BY o_orderpriority""".stripMargin,
    // per-column UNION ALL restating Profile.canon: doubles as integer
    // cents, everything else CAST AS VARCHAR (ISO timestamps under UTC)
    "rp_profile" -> Seq(
        ("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
          "CAST(MAX(o_orderkey) AS VARCHAR)"),
        ("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
          "CAST(MAX(o_custkey) AS VARCHAR)"),
        ("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
        ("o_totalprice",
          "CAST(CAST(ROUND(MIN(o_totalprice)*100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(ROUND(MAX(o_totalprice)*100) AS BIGINT) AS VARCHAR)"),
        ("o_orderdate", "CAST(MIN(o_orderdate) AS VARCHAR)",
          "CAST(MAX(o_orderdate) AS VARCHAR)"),
        ("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)"))
      .map { case (c, mn, mx) =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |COUNT(*) - COUNT($c) AS n_null,
           |COUNT(DISTINCT $c) AS n_distinct,
           |$mn AS min_s, $mx AS max_s FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
  )
}
