package graft

import graft.streaming.{EventStream, StreamHarness}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical pin of the watermark semantics the e_late_data /
  * e_watermark_dedup driver queries rely on: one micro-batch per fixture
  * file, watermark(k) = max event time through batch k-1 minus delay,
  * late rows dropped when their window closed, append emission once the
  * watermark passes window end, dedup state evicted at event ts + delay. */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(id: Long, ts: String, typ: String, v: Double, user: Long = 1L): String =
    s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":$user,"event_type":"$typ","value":$v}"""

  test("windowed counts: late row dropped after window close; open window never emits") {
    val batches = Seq(
      Seq(ev(1, "10:00", "a", 1), ev(2, "10:20", "a", 2), ev(3, "10:50", "b", 3),
        ev(4, "11:05", "a", 4)),
      // wm = 11:05 - 10min = 10:55 -> 10:00 window (end 11:00) still open
      Seq(ev(5, "10:58", "b", 5), ev(6, "10:30", "a", 6), ev(7, "11:40", "a", 7),
        ev(8, "12:10", "b", 8)),
      // wm = 12:10 - 10min = 12:00 -> 10:00 and 11:00 windows closed
      Seq(ev(9, "10:45", "a", 100) /* LATE: dropped */, ev(10, "12:30", "a", 9)),
      // double sentinel: batch 4 advances the in-flight watermark past
      // every real window end, batch 5 forces a DATA batch at that
      // watermark — so all real windows flush whether or not the trailing
      // no-data micro-batch runs, and the sentinels' own (23:00) window
      // stays strictly open under either rule. Observed round-12: the
      // no-data batch DOES run here (final wm = max(all ts) - delay), and
      // with the double sentinel the output is identical either way.
      Seq(ev(99, "23:00", "z", 0)),
      Seq(ev(100, "23:30", "z", 0)),
    )
    val out = StreamHarness.runBatches(spark, batches,
      df => EventStream.windowedCounts(df, "1 hour"))
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // 10:00 window: a -> ids 1,2,6 (sum 9); b -> 3,5 (sum 8). 11:00: a -> 4,7
    // (sum 11). Late id 9 dropped (its window closed at wm 12:00 before
    // batch 3). The sentinels close the 12:00 window too; their own 23:00
    // window never emits.
    assert(out == Set(("10:00", "a", 3L, 9.0), ("10:00", "b", 2L, 8.0),
      ("11:00", "a", 2L, 11.0), ("12:00", "a", 1L, 9.0), ("12:00", "b", 1L, 8.0)),
      out.toString)
  }

  test("dedup within watermark drops; evicted state re-admits") {
    val batches = Seq(
      Seq(ev(1, "10:00", "a", 1), ev(2, "10:01", "b", 2)),
      // wm = 10:01-10min; fpA seen at 10:00 -> dup at 10:05 dropped
      Seq(ev(3, "10:05", "a", 3), ev(4, "10:30", "c", 4)),
      // wm = 10:30-10min = 10:20: fpA(10:00)/fpB(10:01) evicted (ts+10min < wm),
      // fpC(10:30) alive -> e5/e6 re-admitted, e7 dropped
      Seq(ev(5, "10:35", "a", 5), ev(6, "10:36", "b", 6), ev(7, "10:37", "c", 7)),
    )
    val out = StreamHarness.runBatches(spark, batches,
      df => EventStream.streamingDedup(df, col("event_type")))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L, 5L, 6L), out.toString)
  }
}
