package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming path for incremental ingest (§2.11): the
  * reference's `--new-files` / `--modified-files` modes are micro-batch
  * file-source semantics (ref `scripts/ingest/tags2db.py:955-1019`), and
  * its harvest loaders are bounded-memory single-pass scans with batch
  * commits (ref `harvest_mb_recordings.py:36-38`). The idiomatic Spark
  * upgrade is a file-source stream with `Trigger.AvailableNow`:
  * exactly-once new-file pickup, checkpointed progress, identical
  * transform expressions to the batch path ([[graft.queries.StreamQueries]]).
  */
object EventStream {

  /** Streaming read over a parquet directory with the events schema
    * taken from a batch peek (file streams need an explicit schema). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Event-time hourly aggregate with a watermark — same expressions as
    * the batch `st_hourly_window` query; late data beyond 2 hours is
    * dropped instead of re-opening state (bounded state at scale).
    * `ts` may arrive as long nanos (nanosAsLong read) — converted to a
    * proper timestamp for the watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts",
        if (events.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("v_cents"))
      .select(col("w.start").cast("long").as("hour_start"),
        col("event_type"), col("n"), col("v_cents"))

  /** One-shot catch-up run (processes all available input, then stops) —
    * the Trigger.AvailableNow analogue of the reference's incremental
    * import. Caller supplies the sink via `foreachBatch`. */
  def runAvailableNow(agg: DataFrame, checkpoint: String,
      mode: String = "update")(
      sink: (DataFrame, Long) => Unit): Unit = {
    val q: DataStreamWriter[Row] = agg.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
    q.start().awaitTermination()
  }
}
