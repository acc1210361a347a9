package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6: database → DataFrame bridge with the reference's string-default
  * type policy (ref `src/tagminder/core/tm_polars_db.py:8-13, 89-126`:
  * "most columns are returned as Utf8 ... rowid → Int64, __sqlmodded →
  * Int16 (NULL treated as 0)"). Numeric parsing is an explicit
  * downstream expression, exactly as the reference opts in via
  * dtype_overrides.
  */
object DbBridge {

  /** Columns that keep an integer type under the string-default policy. */
  private val IntCols = Set("rowid", "__sqlmodded")

  /** Enforce the stringly-typed contract on an arbitrarily-typed frame:
    * every column casts to string except the system integer columns;
    * `__sqlmodded` NULL → 0 (the reference's read-side convention). */
  def enforceStringPolicy(df: DataFrame): DataFrame = {
    val cols = df.columns.map {
      case c @ "__sqlmodded" =>
        coalesce(col(c).cast("int"), lit(0)).as(c)
      case c if IntCols.contains(c) => col(c).cast("long").as(c)
      case c => col(c).cast("string").as(c)
    }
    df.select(cols.toSeq: _*)
  }

  /** JDBC read with the string policy applied (SQLite/Postgres/etc. —
    * driver jar supplied by the deployment; partition options pass
    * through for parallel reads at scale). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: Properties = new Properties()): DataFrame =
    enforceStringPolicy(spark.read.jdbc(url, table, props))

  /** Typed opt-in mirroring `dtype_overrides`: re-cast named columns of
    * a string-policy frame to explicit types. */
  def withOverrides(df: DataFrame, overrides: Map[String, String]): DataFrame =
    overrides.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
}
