package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Double)]) =
    rows.toDF("event_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")

  test("downsampleOhlc: hand-computed buckets, ts ties break on id") {
    val df = ev(Seq(
      (2L, "2024-01-01 10:00:01", 7.0), // tie with id 1: id 1 is open
      (1L, "2024-01-01 10:00:01", 5.0),
      (3L, "2024-01-01 10:30:00", 1.0),
      (4L, "2024-01-01 10:59:59", 9.0),
      (5L, "2024-01-01 11:00:00", 4.0))) // next bucket
    val out = TimeSeries.downsampleOhlc(df, col("ts"), col("event_id"), col("value"),
      widthSeconds = 3600L)
      .orderBy(col("bucket"))
      .select(col("open"), col("close"), col("high"), col("low"), col("volume"),
        date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("bs"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (5.0, 9.0, 9.0, 1.0, 4L, "2024-01-01 10:00:00"),
      (4.0, 4.0, 4.0, 4.0, 1L, "2024-01-01 11:00:00")))
  }

  test("downsampleOhlc: pre-1970 instants floor into the correct bucket") {
    val df = ev(Seq((1L, "1969-12-31 23:15:00", 2.0)))
    val out = TimeSeries.downsampleOhlc(df, col("ts"), col("event_id"), col("value"), 3600L)
      .select(col("bucket"),
        date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("bs"))
      .collect().head
    // div-truncation would give bucket 0 / start 1970-01-01 00:00:00
    assert(out.getLong(0) == -1L)
    assert(out.getString(1) == "1969-12-31 23:00:00")
  }

  test("downsampleOhlc: keyed form is partition-invariant") {
    val df = ev((1 to 200).map(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:0${i % 6}:00", (i % 37).toDouble)))
      .withColumn("k", col("event_id") % 3)
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.downsampleOhlc(d, col("ts"), col("event_id"), col("value"),
        widthSeconds = 3600L, keys = Seq(col("k")))
        .orderBy(col("k"), col("bucket")).collect().toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(7)))
  }

  test("gapStats: gap counts, max/mean exact; single-event key has NULL max/mean") {
    val df = ev(Seq(
      (1L, "2024-01-01 00:00:00", 0.0),
      (2L, "2024-01-01 00:00:30", 0.0),
      (3L, "2024-01-01 00:01:40", 0.0),
      (4L, "2024-01-01 00:06:40", 0.0))).withColumn("u", lit(1L))
      .union(ev(Seq((5L, "2024-01-01 00:00:00", 0.0))).withColumn("u", lit(2L)))
    val out = TimeSeries.gapStats(df, col("u"), col("ts"), gapSeconds = 60L)
      .orderBy(col("key")).collect()
    val r1 = out(0)
    // gaps: 30 s, 70 s, 300 s -> 2 over threshold; mean = 400/3 s
    assert((r1.getLong(1), r1.getLong(2)) == ((4L, 2L)))
    assert(r1.getDouble(3) == 300.0)
    assert(r1.getDouble(4) == 400000000.0 / 3.0 / 1000000.0)
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2)) == ((1L, 0L)))
    assert(r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("gapStats: equal-timestamp events yield an order-invariant gap multiset") {
    val df = ev(Seq(
      (1L, "2024-01-01 00:00:00", 0.0),
      (2L, "2024-01-01 00:02:00", 0.0),
      (3L, "2024-01-01 00:02:00", 0.0))).withColumn("u", lit(1L))
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.gapStats(d, col("u"), col("ts"), 60L).collect().head
    val a = run(df.coalesce(1))
    val b = run(df.repartition(5))
    // whichever of ids 2/3 sorts first, gaps are {120 s, 0 s}
    assert(a == b)
    assert(a.getLong(2) == 1L && a.getDouble(3) == 120.0)
    assert(a.getDouble(4) == 120000000.0 / 2.0 / 1000000.0)
  }
}
