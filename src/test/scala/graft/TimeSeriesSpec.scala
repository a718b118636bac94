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

  test("funnel: ordered completion only — out-of-order steps don't advance") {
    val df = Seq(
      // u1 completes all three in order
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:01:00", "click"),
      (3L, 1L, "2024-01-01 00:02:00", "purchase"),
      // u2 clicked BEFORE viewing: click must not count
      (4L, 2L, "2024-01-01 00:00:00", "click"),
      (5L, 2L, "2024-01-01 00:01:00", "view"),
      // u3 view only
      (6L, 3L, "2024-01-01 00:00:00", "view"),
      // u4 never viewed: not in the funnel at all
      (7L, 4L, "2024-01-01 00:00:00", "purchase"),
      // u5: simultaneous view+click counts (>= semantics)
      (8L, 5L, "2024-01-01 00:00:00", "view"),
      (9L, 5L, "2024-01-01 00:00:00", "click"),
    ).toDF("event_id", "u", "ts_s", "step")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = TimeSeries.funnel(df, col("u"), col("ts"), col("step"),
      Seq("view", "click", "purchase"))
      .orderBy(col("user"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 3), (2L, 1), (3L, 1), (5L, 2)))
  }

  test("funnel: completed_at is the last completed step's time; layout-invariant") {
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:05:00", "click"),
      (3L, 1L, "2024-01-01 00:01:00", "click"), // earliest qualifying click wins over 00:05
    ).toDF("event_id", "u", "ts_s", "step")
      .withColumn("ts", to_timestamp(col("ts_s")))
    def run(d: org.apache.spark.sql.DataFrame) = TimeSeries.funnel(
      d, col("u"), col("ts"), col("step"), Seq("view", "click"))
      .select(date_format(col("first_at"), "HH:mm").as("f"),
        date_format(col("completed_at"), "HH:mm").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // earliest qualifying click is 00:01
    assert(run(df.coalesce(1)) == Seq(("00:00", "00:01")))
    assert(run(df.repartition(5)) == run(df.coalesce(1)))
    intercept[IllegalArgumentException] {
      TimeSeries.funnel(df, col("u"), col("ts"), col("step"), Seq("a", "a"))
    }
  }

  test("cohort retention: first-seen buckets and return offsets") {
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), // cohort week W
      (2L, 1L, "2024-01-09 00:00:00"), // W+1 (Jan 1 2024 falls mid-bucket)
      (3L, 2L, "2024-01-01 12:00:00"), // same cohort as u1
      (4L, 2L, "2024-01-02 00:00:00"), // same week: offset 0, counted once
      (5L, 3L, "2024-01-09 00:00:00"), // later cohort
    ).toDF("event_id", "u", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = TimeSeries.cohortRetention(df, col("u"), col("ts"), 604800L)
      .orderBy(col("cohort"), col("offset"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // cohort A: 2 users at offset 0, 1 returns at offset 1; cohort B: 1 user
    assert(out == Seq((0L, 2L), (1L, 1L), (0L, 1L)))
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

  test("userGrowth: debut-bucket counting, returning users never recount") {
    val df = ev(Seq(
      (1L, "2024-01-01 08:00:00", 0.0), // u1 debut day 1
      (2L, "2024-01-01 09:00:00", 0.0), // u2 debut day 1
      (3L, "2024-01-02 10:00:00", 0.0), // u1 returns -> not new
      (4L, "2024-01-03 11:00:00", 0.0), // u3 debut day 3 (day 2 has no debut)
    )).withColumn("u",
      when(col("event_id") === 2L, 2L).when(col("event_id") === 4L, 3L).otherwise(1L))
    val got = TimeSeries.userGrowth(df, col("u"), col("ts"), "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01 00:00:00", 2L, 2L),
      ("2024-01-03 00:00:00", 1L, 3L)))
    intercept[IllegalArgumentException] {
      TimeSeries.userGrowth(df, col("u"), col("ts"), "fortnight")
    }
  }
  test("ewmaBaseline: exact means, fixed-order fold, missing buckets skipped") {
    val df = Seq(
      ("a", "2024-01-01 00:10:00", 1.0), ("a", "2024-01-01 00:20:00", 3.0),
      ("a", "2024-01-01 01:10:00", 10.0),
      ("a", "2024-01-01 03:10:00", 2.0), // hour 2 missing: fold skips it
      ("b", "2024-01-01 00:30:00", 5.0),
      ("b", "2024-01-01 00:40:00", null.asInstanceOf[Any]),
    ).map { case (k, t, v) => (k, t, Option(v).map(_.asInstanceOf[Double])) }
      .toDF("event_type", "ts_str", "value")
      .withColumn("ts", to_timestamp(col("ts_str")))
    val got = TimeSeries.ewmaBaseline(df, col("event_type"), col("ts"), col("value"),
      widthSeconds = 3600L, alphaPct = 30)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val e0 = 2.0 // (100+300)/100/2
    val e1 = 0.3 * 10.0 + 0.7 * e0
    val e2 = 0.3 * 2.0 + 0.7 * e1 // hour-3 bucket folds against hour 1
    assert(got == Seq(
      ("a", "2024-01-01 00:00:00", 2L, 2.0, e0),
      ("a", "2024-01-01 01:00:00", 1L, 10.0, e1),
      ("a", "2024-01-01 03:00:00", 1L, 2.0, e2),
      ("b", "2024-01-01 00:00:00", 1L, 5.0, 5.0))) // null value dropped
    val one = TimeSeries.ewmaBaseline(df.coalesce(1), col("event_type"), col("ts"),
      col("value"), 3600L, 30).collect().toSeq
    val many = TimeSeries.ewmaBaseline(df.repartition(5), col("event_type"), col("ts"),
      col("value"), 3600L, 30).collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaBaseline(df, col("event_type"), col("ts"), col("value"), 3600L, 0)
    }
  }

  test("cusumChangepoint: closed form equals the sequential recursion, per key") {
    import spark.implicits._
    // d = v - 2 = [3, -5, -9, 8] -> S = [3, 0, 0, 8] (hand recursion)
    val df = Seq(("a", 1L, 5L), ("a", 2L, -3L), ("a", 3L, -7L), ("a", 4L, 10L),
      ("b", 1L, 100L)).toDF("k", "i", "v")
    val got = TimeSeries.cusumChangepoint(df, col("k"), Seq(col("i")), col("v"),
      bias = 2L, threshold = 5L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("a", 1L)) == (3L, false))
    assert(got(("a", 2L)) == (0L, false))
    assert(got(("a", 3L)) == (0L, false))
    assert(got(("a", 4L)) == (8L, true))
    assert(got(("b", 1L)) == (98L, true)) // keys are independent
    // property: closed form equals the direct sequential fold on a
    // longer deterministic series
    val vals = (0 until 200).map(i => ((i * 37) % 23).toLong - 10L)
    val ser = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "i", "v")
    val out = TimeSeries.cusumChangepoint(ser, col("k"), Seq(col("i")), col("v"), 0L, 50L)
      .orderBy(col("i")).collect().map(_.getLong(3))
    var s = 0L
    val want = vals.map { v => s = math.max(0L, s + v); s }
    assert(out.toSeq == want)
  }

  test("augmentSpanCorruption: sentinel numbering, reconstruction, zero-rate identity") {
    import spark.implicits._
    import graft.operators.Curation
    val text = (0 until 16).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text)).toDF("id", "text")
    // all blocks masked: sentinels number in document order
    val all = Curation.augmentSpanCorruption(df, col("id"), col("text"),
      maskPermille = 1000, blockSize = 8).collect()(0)
    val (corr, targ, nMasked) = (all.getString(1), all.getString(2), all.getLong(4))
    assert(corr.startsWith("<extra_id_0> ") && corr.contains("<extra_id_1>"), corr)
    assert(nMasked >= 2L && nMasked <= 6L) // two blocks, 1-3 tokens each
    // reconstruction: corrupted + targets hold all 16 tokens plus two
    // sentinel pairs, nothing lost or duplicated
    val toks = (corr.split(" ") ++ targ.split(" ")).toSeq
    val sentinels = toks.count(_.startsWith("<extra_id_"))
    assert(sentinels == 4) // each of 2 sentinels appears in corr AND targ
    assert(toks.filterNot(_.startsWith("<extra_id_")).sorted ==
      (0 until 16).map(i => s"t$i").sorted)
    assert(all.getLong(3) == 16L)
    // zero rate: identity corruption, empty targets
    val zero = Curation.augmentSpanCorruption(df, col("id"), col("text"),
      maskPermille = 0, blockSize = 8).collect()(0)
    assert(zero.getString(1) == text && zero.getString(2) == "" && zero.getLong(4) == 0L)
    // partitioning invariance
    val many = (0L until 50L).map(i => (i, s"w$i " * 20)).toDF("id", "text")
    val a = Curation.augmentSpanCorruption(many.repartition(7), col("id"), col("text"), 300)
      .orderBy(col("id")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val b = Curation.augmentSpanCorruption(many.coalesce(1), col("id"), col("text"), 300)
      .orderBy(col("id")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(a == b)
  }
}
