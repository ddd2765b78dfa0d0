package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface.
  *
  * The reference's only "streaming" construct is the Watcher daemon — a
  * polling work queue that picks up dropped uploads (spawn.py:40-430).
  * SURVEY §2.10's translation decision: a file-source stream with
  * `Trigger.AvailableNow` reproduces those semantics exactly (append-only
  * arrival, exactly-once per file, drains whatever is present and stops).
  * The windowed rollup is the streaming twin of
  * [[graft.ops.Events.hourlyRollup]] for always-on event feeds.
  */
object StreamingIngest {

  /** Watch a drop directory of parquet files (the Watcher's inbox). */
  def watchParquetDir(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window rollup with a watermark: per (window, event_type)
    * counts/sums. State is bounded by the watermark — safe for an
    * unbounded 100 TB/day feed. `ts` must be a TimestampType column. */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))

  /** Drain-everything-then-stop runner (Watcher semantics): processes
    * all files currently in the source, exactly once, then returns. */
  def drainToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Continuous ingest into a parquet catalog table with checkpointing —
    * the production path of the upload watcher. */
  def ingestTo(df: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
