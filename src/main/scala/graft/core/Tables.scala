package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table readers for the driver-generated parquet under the
  * sf0.001 / sf0.01 / sf0.1 testdata dirs (see TESTDATA.md). Column
  * pruning + predicate
  * pushdown reach the parquet scan automatically because every query is
  * declared against these DataFrames (Catalyst ColumnPruning /
  * PushDownPredicate). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))

  /** Every consumer of the events table assumes `ts` is long epoch
    * NANOS. What the parquet physically carries has varied across
    * fixture generations: TIMESTAMP(NANOS) (read as long under
    * `nanosAsLong`), or µs-precision TIMESTAMP / TIMESTAMP_NTZ.
    * Normalize here — the single chokepoint — so downstream arithmetic
    * (`ts div 1000`, gap thresholds in nanos) and the DuckDB oracles
    * (`epoch_us`/`epoch_ns`, both precision-independent) agree
    * regardless of the generator's precision choice. µs inputs become
    * micros×1000 (nanos with zero sub-µs remainder — exactly what
    * `epoch_ns` yields on a µs timestamp). NTZ wall clock is
    * interpreted as UTC; every SparkSession in this repo pins
    * `spark.sql.session.timeZone=UTC`, making the cast the identity
    * on instants. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected long " +
            "nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
