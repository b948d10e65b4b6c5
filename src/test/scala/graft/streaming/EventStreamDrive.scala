package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.engine.{Sessions, Tables}

/** Manual end-to-end drive: the driver's events parquet replayed as a file
  * stream through the event-time operators → memory sink → read-back.
  * Run: `sbt "Test/runMain graft.streaming.EventStreamDrive"`.
  */
object EventStreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "event-stream-drive")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Batch read (handles the nanos conversion), re-staged as parquet so the
    // streaming source sees a plain µs-timestamp table.
    val staged = java.nio.file.Files.createTempDirectory("events-staged-")
    Tables(spark, dir, "events").write.mode("overwrite")
      .parquet(staged.toString)
    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)

    val q = EventStreams.tumblingCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("hourly")
    println(s"STREAM_WINDOWS=${out.count()}")
    out.orderBy("window_start", "event_type").show(6, truncate = false)

    val q2 = EventStreams.sessionCounts(stream, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    println(s"STREAM_SESSIONS=${spark.table("sessions").count()}")
    spark.stop()
  }
}
