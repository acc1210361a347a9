package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Tables => T}

/** The analytics-dashboard shape (SURVEY §3.3, ref
  * `scripts/reports/92-library-insights.py`): ONE cached base read
  * feeding many aggregation branches, each emitted as a result table
  * (rendering is out of engine scope). The cache means the scan + derive
  * cost is paid once however many KPI branches hang off it.
  */
object Insights {

  /** Base fact frame: orders enriched with derived columns, cached. */
  def base(spark: SparkSession, dir: String): DataFrame =
    T.orders(spark, dir)
      .withColumn("tp_cents", Exprs.cents(col("o_totalprice")))
      .withColumn("yr", year(col("o_orderdate").cast("date")))
      .cache()

  /** Headline KPIs — scalar aggregates in one pass. */
  def kpis(b: DataFrame): DataFrame =
    b.agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"),
      sum(col("tp_cents")).as("revenue_cents"),
      (sum(col("tp_cents")).cast("double") / count(lit(1)))
        .as("avg_order_cents"),
      min(col("yr")).as("first_yr"), max(col("yr")).as("last_yr"))

  /** Yearly trend branch. */
  def yearlyTrends(b: DataFrame): DataFrame =
    b.groupBy("yr")
      .agg(count(lit(1)).as("n"), sum(col("tp_cents")).as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("yr")

  /** Priority-mix branch (share-of-total via a window denominator). */
  def priorityMix(b: DataFrame): DataFrame = {
    val counts = b.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    counts
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
      .orderBy("o_orderpriority")
  }
}
