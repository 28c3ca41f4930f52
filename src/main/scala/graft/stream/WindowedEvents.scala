package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Event-time windowed streaming aggregation — the Structured Streaming
 * surface (watermark + tumbling window) the reference never needed (strict
 * id order, no event time — SURVEY.md §2.10) but a general engine exposes.
 */
object WindowedEvents {

  /** Tumbling-window counts per event_type with a watermark. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("v"))

  /** Run the streaming query over a parquet dir to completion (AvailableNow)
    * into an in-memory table; returns the result. */
  def runOnce(sourceDir: String, schema: org.apache.spark.sql.types.StructType,
              queryName: String)(implicit spark: SparkSession): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = windowedCounts(stream).writeStream
      .format("memory").queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
