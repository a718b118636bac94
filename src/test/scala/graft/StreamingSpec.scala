package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("file-arrival stream: windowed counts match batch over same data") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"click","value":1.5}""",
      """{"event_id":2,"ts":"2024-01-01T00:25:00.000Z","user_id":2,"event_type":"click","value":2.5}""",
      """{"event_id":3,"ts":"2024-01-01T01:10:00.000Z","user_id":1,"event_type":"view","value":3.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "part1.json"), json)

    val q = EventStream
      .windowedCounts(EventStream.readEventStream(spark, dir))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_counts")
      .start()
    try {
      q.processAllAvailable()
      // Append mode only emits closed windows; finalize by writing a late file
      // far past the watermark.
      Files.writeString(java.nio.file.Paths.get(dir, "part2.json"),
        """{"event_id":9,"ts":"2024-01-01T09:00:00.000Z","user_id":9,"event_type":"x","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("win_counts")
      .orderBy(col("window_start"), col("event_type"))
      .collect().map(r => (r.getAs[Timestamp]("window_start").toInstant.toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(got.contains(("2024-01-01T00:00:00Z", "click", 2L, 4.0)))
    assert(got.contains(("2024-01-01T01:00:00Z", "view", 1L, 3.0)))
  }

  test("stateful sessionization accumulates per-user state") {
    val events = Seq(
      EventStream.Event(1, 10, 1.0), EventStream.Event(2, 10, 2.0),
      EventStream.Event(3, 20, 5.0),
    ).toDS()
    val got = EventStream.sessionize(events).orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((10L, 2L, 3.0), (20L, 1L, 5.0)))
  }
}
