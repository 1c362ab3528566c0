package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Structured-Streaming operators. Each streaming query has a batch
  * twin with identical semantics: the batch twin is the driver-facing
  * (oracle-checkable) query; StreamingSpec runs the real readStream
  * pipeline against the same parquet and asserts parity.
  */
object StreamOps {

  /** Batch twin of the streaming rollup: 10-minute tumbling windows
    * per event type. window() is epoch-aligned, so the oracle can
    * reconstruct window_start as floor(epoch/600)·600. */
  def rollup10m(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** The real streaming pipeline: readStream over a DIRECTORY of
    * event parquet files (FileStreamSource requires a directory;
    * nanos read as long, converted in-stream), 30-min watermark,
    * same 10-min tumbling aggregation. Used by StreamingSpec via a
    * memory sink; in production the source/sink become Kafka/Delta
    * and the watermark bounds state size. */
  def rollupStream(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }
}
