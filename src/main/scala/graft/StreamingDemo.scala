package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming

/** Runnable demo of the streaming tier: stages the sf0.001 events table as
  * a file stream, runs the watermarked weekly window aggregation, and
  * prints the result. Usage: runMain graft.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = Files.createTempDirectory("events-stream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(stage)

    val q = EventsStreaming.windowedStats(
        EventsStreaming.readEventsStream(spark, stage))
      .writeStream.outputMode("complete")
      .format("memory").queryName("weekly_stream").start()
    q.processAllAvailable(); q.stop()

    println("== streaming weekly stats ==")
    spark.table("weekly_stream")
      .select(col("window.start").as("week_start"), col("event_type"),
        col("transactions"), col("value_mean"), col("value_median"))
      .orderBy("week_start", "event_type")
      .show(50, false)
    spark.stop()
  }
}
