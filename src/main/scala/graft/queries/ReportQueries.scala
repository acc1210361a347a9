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
  )
}
