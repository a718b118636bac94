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

  test("session windows stream: append emits closed sessions after watermark") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:10:00.000Z","user_id":1,"event_type":"a","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T02:00:00.000Z","user_id":1,"event_type":"a","value":4.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    val q = EventStream
      .sessionWindows(EventStream.readEventStream(spark, dir), "30 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(dir, "p2.json"),
        """{"event_id":9,"ts":"2024-01-01T09:00:00.000Z","user_id":9,"event_type":"x","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions").orderBy(col("session_start"))
      .collect().map(r => (r.getAs[Timestamp]("session_start").toInstant.toString,
        r.getAs[Timestamp]("session_end").toInstant.toString,
        r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    // events 1+2 merge (10 min < gap); event 3 opens its own session
    assert(got.contains(("2024-01-01T00:00:00Z", "2024-01-01T00:40:00Z", 1L, 2L, 3.0)))
    assert(got.contains(("2024-01-01T02:00:00Z", "2024-01-01T02:30:00Z", 1L, 1L, 4.0)))
  }

  test("streaming dedup drops in-watermark duplicate fingerprints") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000Z","user_id":1,"event_type":"same","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:01:00.000Z","user_id":1,"event_type":"same","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:02:00.000Z","user_id":1,"event_type":"other","value":2.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    val q = EventStream
      .streamingDedup(EventStream.readEventStream(spark, dir),
        md5(concat_ws(":", col("user_id"), col("event_type"), col("value"))))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdedup").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sdedup").collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == Set(1L, 3L)) // event 2 is an in-watermark duplicate
  }

  test("session windows: streamed results numerically equal the batch twin") {
    val dir = Files.createTempDirectory("graft-sess-par").toString
    val json = (0 until 40).map { i =>
      val min = (i * 7) % 180 // gaps of 7 min, wrapping -> several sessions
      f"""{"event_id":$i,"ts":"2024-01-01T${min / 60}%02d:${min % 60}%02d:00.000Z","user_id":${i % 3},"event_type":"a","value":${i * 1.5}}"""
    }.mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    val q = EventStream
      .sessionWindows(EventStream.readEventStream(spark, dir), "30 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_par").start()
    try {
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(dir, "p2.json"),
        """{"event_id":99,"ts":"2024-01-02T09:00:00.000Z","user_id":9,"event_type":"x","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("user_id") =!= 9)
      .select(col("session_start"), col("session_end"), col("user_id"),
        col("n"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val streamed = canon(spark.table("sess_par"))
    val batch = canon(EventStream.sessionWindows(
      spark.read.schema(EventStream.eventSchema).json(dir), "30 minutes"))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("asOfLookup enriches a stream against a static reference (stream-static join)") {
    val dir = Files.createTempDirectory("graft-asof-stream").toString
    Files.writeString(java.nio.file.Paths.get(dir, "p.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:30:00.000Z","user_id":1,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:30:00.000Z","user_id":2,"event_type":"click","value":3.0}""",
    ).mkString("\n"))
    val probes = EventStream.readEventStream(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val refs = Seq(
      (1L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:10:00Z")), "cfgA"),
      (1L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")), "cfg0"),
      (2L, Timestamp.from(java.time.Instant.parse("2024-01-01T01:00:00Z")), "late"),
    ).toDF("user_id", "rts", "cfg")
    val q = graft.operators.AsOfJoin
      .asOfLookup(probes, refs, Seq("user_id"), "ts", "rts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("asof_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("asof_stream").orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), Option(r.getAs[String]("cfg")).orNull))
      .toSeq
    // event 1 predates cfgA -> cfg0; event 2 after cfgA; user 2's only ref is later -> null
    assert(got == Seq((1L, "cfg0"), (2L, "cfgA"), (3L, null)))
  }

  test("binned range join composes with a streaming point side (stream-static)") {
    val dir = Files.createTempDirectory("graft-range-stream").toString
    Files.writeString(java.nio.file.Paths.get(dir, "p.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T02:30:00.000Z","user_id":1,"event_type":"click","value":2.0}""",
    ).mkString("\n"))
    val points = EventStream.readEventStream(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("x"))
    val intervals = Seq(
      // covers event 1 (00:00-01:00), misses event 2
      (1L, 10L,
        java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L,
        java.time.Instant.parse("2024-01-01T01:00:00Z").toEpochMilli * 1000L),
    ).toDF("user_id", "iid", "s", "e")
    val q = graft.operators.RangeJoin
      .pointInInterval(points, intervals, Seq("user_id"), "x", "s", "e",
        binWidth = 3600L * 1000000L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("range_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("range_stream")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("iid"))).toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("stream-stream interval join matches the batch twin on the same data") {
    val dirL = Files.createTempDirectory("graft-ij-l").toString
    val dirR = Files.createTempDirectory("graft-ij-r").toString
    // views (left) and purchases (right); user 1 converts twice within 15
    // minutes of view 1, user 2's purchase is 20 min late, user 3 has an
    // exact-boundary conversion (inclusive end)
    Files.writeString(java.nio.file.Paths.get(dirL, "l.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:00.000Z","user_id":2,"event_type":"view","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:00:00.000Z","user_id":3,"event_type":"view","value":1.0}""",
    ).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dirR, "r.json"), Seq(
      """{"event_id":11,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"purchase","value":9.0}""",
      """{"event_id":12,"ts":"2024-01-01T00:14:00.000Z","user_id":1,"event_type":"purchase","value":8.0}""",
      """{"event_id":13,"ts":"2024-01-01T00:20:00.000Z","user_id":2,"event_type":"purchase","value":7.0}""",
      """{"event_id":14,"ts":"2024-01-01T00:15:00.000Z","user_id":3,"event_type":"purchase","value":6.0}""",
    ).mkString("\n"))
    val q = EventStream.intervalJoin(
      EventStream.readEventStream(spark, dirL),
      EventStream.readEventStream(spark, dirR),
      within = "15 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_stream").start()
    try {
      q.processAllAvailable()
      // advance both watermarks so all joinable pairs are emitted
      Files.writeString(java.nio.file.Paths.get(dirL, "l2.json"),
        """{"event_id":8,"ts":"2024-01-01T09:00:00.000Z","user_id":9,"event_type":"view","value":0.0}""")
      Files.writeString(java.nio.file.Paths.get(dirR, "r2.json"),
        """{"event_id":9,"ts":"2024-01-01T09:00:00.000Z","user_id":8,"event_type":"purchase","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ij_stream")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("l_id"),
        r.getAs[Long]("r_id"))).toSet
    assert(streamed == Set((1L, 1L, 11L), (1L, 1L, 12L), (3L, 3L, 14L)))
    // batch twin over the same rows returns exactly the same pairs
    val allRows = spark.read.schema(EventStream.eventSchema).json(dirL, dirR)
    val batch = EventStream.intervalJoin(
      allRows.filter(col("event_type") === "view"),
      allRows.filter(col("event_type") === "purchase"),
      within = "15 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("l_id"),
        r.getAs[Long]("r_id"))).toSet
    assert(batch == streamed)
  }

  test("left-outer interval join emits unmatched views once absence is proven") {
    val dirL = Files.createTempDirectory("graft-ijo-l").toString
    val dirR = Files.createTempDirectory("graft-ijo-r").toString
    Files.writeString(java.nio.file.Paths.get(dirL, "l.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:00.000Z","user_id":2,"event_type":"view","value":1.0}""",
    ).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dirR, "r.json"), Seq(
      """{"event_id":11,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"purchase","value":9.0}""",
      """{"event_id":13,"ts":"2024-01-01T00:20:00.000Z","user_id":2,"event_type":"purchase","value":7.0}""",
    ).mkString("\n"))
    val q = EventStream.intervalJoin(
      EventStream.readEventStream(spark, dirL),
      EventStream.readEventStream(spark, dirR),
      within = "15 minutes", joinType = "left_outer")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ijo_stream").start()
    try {
      q.processAllAvailable()
      // push both watermarks far past user 2's window so the null-padded
      // row is provably unmatched and can be emitted
      Files.writeString(java.nio.file.Paths.get(dirL, "l2.json"),
        """{"event_id":8,"ts":"2024-01-01T09:00:00.000Z","user_id":9,"event_type":"view","value":0.0}""")
      Files.writeString(java.nio.file.Paths.get(dirR, "r2.json"),
        """{"event_id":9,"ts":"2024-01-01T09:00:00.000Z","user_id":8,"event_type":"purchase","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ijo_stream")
      .filter(col("user_id").isin(1L, 2L))
      .collect().map(r => (r.getAs[Long]("user_id"),
        Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong))).toSet
    // user 1 converted in-window; user 2's purchase was 20 min late ->
    // the view emits null-padded
    assert(got == Set((1L, Some(11L)), (2L, None)))
  }

  test("streaming OHLC downsample equals the batch twin (complete mode)") {
    val dir = Files.createTempDirectory("graft-ohlc").toString
    Files.writeString(java.nio.file.Paths.get(dir, "e.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:01.000Z","user_id":1,"event_type":"view","value":5.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:00:01.000Z","user_id":1,"event_type":"view","value":7.0}""",
      """{"event_id":3,"ts":"2024-01-01T10:30:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":4,"ts":"2024-01-01T11:00:00.000Z","user_id":1,"event_type":"view","value":4.0}""",
    ).mkString("\n"))
    val q = graft.operators.TimeSeries.downsampleOhlc(
      EventStream.readEventStream(spark, dir),
      col("ts"), col("event_id"), col("value"), widthSeconds = 3600L)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ohlc_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ohlc_stream")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("open"),
        r.getAs[Double]("close"), r.getAs[Long]("volume"))).toSeq
    val batch = graft.operators.TimeSeries.downsampleOhlc(
      spark.read.schema(EventStream.eventSchema).json(dir),
      col("ts"), col("event_id"), col("value"), widthSeconds = 3600L)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("open"),
        r.getAs[Double]("close"), r.getAs[Long]("volume"))).toSeq
    assert(streamed == batch)
    assert(batch.map(b => (b._2, b._3, b._4)) == Seq((5.0, 1.0, 3L), (4.0, 4.0, 1L)))
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

  test("windowed drift: identical mix gives psi ~ smoothing-only; fold catches unknowns") {
    def ev(id: Long, hour: Int, minute: Int, typ: String) =
      (id, Timestamp.from(java.time.Instant.parse(
        f"2024-01-01T$hour%02d:$minute%02d:00Z")), typ)
    // hour 0 mirrors the reference mix exactly; hour 1 is all-"b" plus an
    // unknown type that must fold into <other>
    val events = (Seq(
      ev(1, 0, 5, "a"), ev(2, 0, 10, "a"), ev(3, 0, 20, "b"),
      ev(4, 1, 5, "b"), ev(5, 1, 10, "b"), ev(6, 1, 20, "zz"),
    )).toDF("event_id", "ts", "event_type")
    val ref = Seq(("a", 2L), ("b", 1L)).toDF("category", "ref_n")
    val rows = EventStream.windowedDrift(events, col("event_type"), ref, "1 hour")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n"), r.getAs[Long]("psi_n9")))).toMap
    // category space per window = {a, b, <other>}, both windows complete
    assert(rows.keySet == Set(
      ("2024-01-01 00:00:00", "a"), ("2024-01-01 00:00:00", "b"), ("2024-01-01 00:00:00", "<other>"),
      ("2024-01-01 01:00:00", "a"), ("2024-01-01 01:00:00", "b"), ("2024-01-01 01:00:00", "<other>")))
    assert(rows(("2024-01-01 01:00:00", "<other>"))._1 == 1L) // zz folded
    val psiSame = rows(("2024-01-01 00:00:00", "a"))._2
    val psiShift = rows(("2024-01-01 01:00:00", "a"))._2
    // hour 0 matches the reference mix exactly (shares identical, psi 0);
    // hour 1's inverted mix must read clearly drifted
    assert(psiSame == 0L, s"psiSame=$psiSame")
    assert(psiShift > 250000000L, s"psiShift=$psiShift")
  }

  test("windowed drift: stage-1 counts stream; batch assembly matches the batch twin") {
    val dir = Files.createTempDirectory("graft-drift").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:15:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:25:00.000Z","user_id":2,"event_type":"b","value":1.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    // stage 1 as a live stream: the watermarkable per-(window, type) count
    val q = EventStream.readEventStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("drift_counts").start()
    try {
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(dir, "p2.json"),
        """{"event_id":9,"ts":"2024-01-01T09:00:00.000Z","user_id":9,"event_type":"x","value":0.0}""")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("drift_counts")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .filter(col("w") < lit(Timestamp.from(java.time.Instant.parse("2024-01-01T09:00:00Z"))))
      .collect().map(r => (r.getAs[Timestamp](0).toInstant.toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == Set(("2024-01-01T00:00:00Z", "a", 2L), ("2024-01-01T00:00:00Z", "b", 1L)))
  }

  test("windowed drift end-to-end in foreachBatch equals the batch twin") {
    // the live deployment shape: each micro-batch runs the FULL
    // windowedDrift assembly over the events seen so far (source-side
    // accumulation; a production job would fold counts incrementally)
    val dir = Files.createTempDirectory("graft-drift-fb").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:15:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:25:00.000Z","user_id":2,"event_type":"b","value":1.0}""",
      """{"event_id":4,"ts":"2024-01-01T01:10:00.000Z","user_id":2,"event_type":"b","value":1.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    val ref = Seq(("a", 2L), ("b", 2L)).toDF("category", "ref_n")
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Array[org.apache.spark.sql.Row]]()
    val q = EventStream.readEventStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // batch is a plain DataFrame: the whole drift assembly applies
        results.put(id, EventStream.windowedDrift(
          batch.select(col("ts"), col("event_type")), col("event_type"), ref, "1 hour")
          .collect())
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = results.values().iterator().next()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Long]("psi_n9"))).toSeq.sortBy(t => (t._1, t._2))
    val batchTwin = EventStream.windowedDrift(
      Seq(("2024-01-01 00:05:00", "a"), ("2024-01-01 00:15:00", "a"),
        ("2024-01-01 00:25:00", "b"), ("2024-01-01 01:10:00", "b"))
        .toDF("ts_str", "event_type")
        .withColumn("ts", to_timestamp(col("ts_str"))),
      col("event_type"), ref, "1 hour")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Long]("psi_n9"))).toSeq.sortBy(t => (t._1, t._2))
    assert(streamed == batchTwin)
    assert(streamed.map(_._1).distinct == Seq("2024-01-01 00:00:00", "2024-01-01 01:00:00"))
  }

  test("slidingCounts: every event lands in exactly length/slide panes") {
    val df = Seq(
      ("2024-01-01 00:30:00", "a"), ("2024-01-01 00:45:00", "a"),
      ("2024-01-01 01:30:00", "b"),
    ).toDF("ts_str", "event_type").withColumn("ts", to_timestamp(col("ts_str")))
    val got = EventStream.slidingCounts(df, "2 hours", "1 hour")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    // a@00:30/00:45 -> panes starting 23:00 and 00:00; b@01:30 -> 00:00, 01:00
    assert(got == Seq(
      ("2023-12-31 23:00:00", "a", 2L),
      ("2024-01-01 00:00:00", "a", 2L),
      ("2024-01-01 00:00:00", "b", 1L),
      ("2024-01-01 01:00:00", "b", 1L)))
    // total pane contributions = 2 panes per event
    assert(got.map(_._3).sum == 2L * df.count())
  }

  test("windowed W1 drift in foreachBatch equals the batch twin, exact") {
    val dir = Files.createTempDirectory("graft-wdrift-fb").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"a","value":5.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:15:00.000Z","user_id":1,"event_type":"a","value":15.0}""",
      """{"event_id":3,"ts":"2024-01-01T01:10:00.000Z","user_id":2,"event_type":"b","value":35.0}""",
      """{"event_id":4,"ts":"2024-01-01T01:20:00.000Z","user_id":2,"event_type":"b","value":35.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    // uniform reference over 4 ten-wide buckets
    val ref = Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L)).toDF("bucket", "ref_n")
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Array[org.apache.spark.sql.Row]]()
    val q = EventStream.readEventStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        results.put(id, EventStream.windowedWassersteinDrift(
          batch, col("value"), ref, 0L, 40L, 4, "1 hour").collect())
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    def render(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getInt(1), r.getLong(4), r.getDouble(6)))
        .sortBy(t => (t._1, t._2))
    val streamed = render(results.values().iterator().next().toSeq)
    val batchTwin = render(EventStream.windowedWassersteinDrift(
      Seq(("2024-01-01 00:05:00", 5.0), ("2024-01-01 00:15:00", 15.0),
        ("2024-01-01 01:10:00", 35.0), ("2024-01-01 01:20:00", 35.0))
        .toDF("ts_str", "value")
        .withColumn("ts", to_timestamp(col("ts_str"))),
      col("value"), ref, 0L, 40L, 4, "1 hour").collect().toSeq)
    assert(streamed == batchTwin)
    // window 0 holds buckets {0,1} vs uniform ref: CDF gaps |2*4-1*2|=6,
    // |4*2... hand math: cum_w = 1,2,2,2; cum_ref = 1,2,3,4; t_w=2, t_ref=4
    // diff = |1*4-1*2|=2, |2*4-2*2|=4, |8-3*2|=2, 0 -> w1_num=8,
    // w1 = 8/(2*4)*10 = 10.0
    val w0 = streamed.filter(_._1 == "2024-01-01 00:00:00")
    assert(w0.map(_._3) == Seq(2L, 4L, 2L, 0L) && w0.head._4 == 10.0, w0.toString)
  }

  test("CDC apply in foreachBatch: maintained snapshot equals one-shot apply") {
    import graft.operators.Incremental
    // a change stream arriving as two micro-batches; the maintained
    // snapshot after both must equal applying the union in one shot
    // (applyChangelog's champion semantics make fold order irrelevant
    // only ACROSS keys touched once per batch — replay/idempotence is
    // spec'd in IncrementalSpec; here we prove the streaming fold shape)
    val dir = Files.createTempDirectory("graft-cdc-fb").toString
    val b1 = Seq(
      """{"k":2,"ver":100,"op":"U","name":"b2","v":21.0}""",
      """{"k":4,"ver":100,"op":"I","name":"d","v":40.0}""").mkString("\n")
    val b2 = Seq(
      """{"k":3,"ver":200,"op":"D","name":null,"v":0.0}""",
      """{"k":4,"ver":210,"op":"U","name":"d2","v":41.0}""").mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "b1.json"), b1)
    val snap0 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val state = new java.util.concurrent.atomic.AtomicReference(snap0)
    val schema = "k LONG, ver LONG, op STRING, name STRING, v DOUBLE"
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = Incremental.applyChangelog(
          state.get(), batch, col("k"), col("ver"), col("op"), Seq("name", "v"))
          .withColumnRenamed("key", "k").localCheckpoint(true)
        state.set(next)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(dir, "b2.json"), b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = state.get().orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val oneShot = Incremental.applyChangelog(
      snap0,
      Seq((2L, 100L, "U", "b2", 21.0), (4L, 100L, "I", "d", 40.0),
        (3L, 200L, "D", null, 0.0), (4L, 210L, "U", "d2", 41.0))
        .toDF("k", "ver", "op", "name", "v"),
      col("k"), col("ver"), col("op"), Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(streamed == oneShot)
    assert(streamed == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d2", 41.0)))
  }
  test("windowedTopK: per-window exact top-k, name tie-break, k cut, rank order") {
    val df = Seq(
      ("2024-01-01 00:05:00", "a"), ("2024-01-01 00:10:00", "a"), ("2024-01-01 00:20:00", "a"),
      ("2024-01-01 00:25:00", "b"), ("2024-01-01 00:30:00", "b"),
      ("2024-01-01 00:40:00", "c"), ("2024-01-01 00:45:00", "d"),
      ("2024-01-01 01:10:00", "x"),
    ).toDF("ts_str", "event_type").withColumn("ts", to_timestamp(col("ts_str")))
    val got = EventStream.windowedTopK(df, col("event_type"), "1 hour", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    // hour 0: a(3), b(2), then the n=1 tie breaks to c over d; d is cut at k=3
    assert(got == Seq(
      ("2024-01-01 00:00:00", "a", 3L, 1),
      ("2024-01-01 00:00:00", "b", 2L, 2),
      ("2024-01-01 00:00:00", "c", 1L, 3),
      ("2024-01-01 01:00:00", "x", 1L, 1)))
    val one = EventStream.windowedTopK(df.coalesce(1), col("event_type"), "1 hour", 3)
      .collect().toSeq
    val many = EventStream.windowedTopK(df.repartition(5), col("event_type"), "1 hour", 3)
      .collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      EventStream.windowedTopK(df, col("event_type"), "1 hour", k = 0)
    }
  }

  test("windowedTopK stage-1 counts stream; the rank assembly matches the batch twin") {
    val dir = Files.createTempDirectory("graft-wtopk").toString
    val json = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:15:00.000Z","user_id":1,"event_type":"a","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:25:00.000Z","user_id":2,"event_type":"b","value":1.0}""",
    ).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(dir, "p1.json"), json)
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Array[org.apache.spark.sql.Row]]()
    val q = EventStream.readEventStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        results.put(id, EventStream.windowedTopK(
          batch.select(col("ts"), col("event_type")), col("event_type"), "1 hour", 2)
          .collect())
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = results.values().iterator().next()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    assert(streamed == Seq(
      ("2024-01-01 00:00:00", "a", 2L, 1), ("2024-01-01 00:00:00", "b", 1L, 2)))
  }

  test("gapSessions: supersession and event-time timeout both close exactly once") {
    // the e_stateful_session fixture trajectory, pinned (the LateDataSpec
    // discipline): u1-A closes by SUPERSESSION when 11:02 arrives (gap 52
    // min > 30), u2 closes by TIMEOUT under wm 10:52 (timeout 10:48),
    // u1-B by TIMEOUT under wm 12:50 (timeout 11:32); the sentinel user
    // 99 drives the watermark and emits nothing (its state dies with the
    // stream, unfired).
    def ev(id: Long, ts: String, u: Long, v: Double): String =
      s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":$u,"event_type":"x","value":$v}"""
    val batches = Seq(
      Seq(ev(1, "10:00", 1, 1), ev(2, "10:10", 1, 2), ev(3, "10:05", 2, 10)),
      Seq(ev(4, "11:02", 1, 3), ev(5, "10:18", 2, 11)),
      Seq(ev(90, "13:00", 99, 0)),
      Seq(ev(91, "13:30", 99, 0)),
    )
    val got = graft.streaming.StreamHarness.runBatches(spark, batches,
      df => EventStream.gapSessions(df, gapMinutes = 30))
      .orderBy(col("user_id"), col("session_start"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[Timestamp]("session_start").toInstant.toString,
        r.getAs[Timestamp]("session_end").toInstant.toString,
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSeq
    assert(got == Seq(
      (1L, "2024-03-01T10:00:00Z", "2024-03-01T10:10:00Z", 2L, 3.0),
      (1L, "2024-03-01T11:02:00Z", "2024-03-01T11:02:00Z", 1L, 3.0),
      (2L, "2024-03-01T10:05:00Z", "2024-03-01T10:18:00Z", 2L, 21.0)))
    // sentinel's own state never emitted — exactly the 3 real sessions
    assert(got.size == 3)
  }

  test("gapSessionsTws (transformWithState + RocksDB) matches the gapSessions trajectory") {
    // identical fixture to the flatMapGroupsWithState pin above — the two
    // state APIs implement one contract; u1-A closes by supersession,
    // u2 and u1-B by explicit event-time TIMER fires
    def ev(id: Long, ts: String, u: Long, v: Double): String =
      s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":$u,"event_type":"x","value":$v}"""
    val batches = Seq(
      Seq(ev(1, "10:00", 1, 1), ev(2, "10:10", 1, 2), ev(3, "10:05", 2, 10)),
      Seq(ev(4, "11:02", 1, 3), ev(5, "10:18", 2, 11)),
      Seq(ev(90, "13:00", 99, 0)),
      Seq(ev(91, "13:30", 99, 0)),
    )
    val got = graft.streaming.StreamHarness.runBatches(spark, batches,
      df => EventStream.gapSessionsTws(df, gapMinutes = 30),
      conf = Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      .filter(col("user_id") < 99)
      .orderBy(col("user_id"), col("session_start"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[Timestamp]("session_start").toInstant.toString,
        r.getAs[Timestamp]("session_end").toInstant.toString,
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSeq
    assert(got == Seq(
      (1L, "2024-03-01T10:00:00Z", "2024-03-01T10:10:00Z", 2L, 3.0),
      (1L, "2024-03-01T11:02:00Z", "2024-03-01T11:02:00Z", 1L, 3.0),
      (2L, "2024-03-01T10:05:00Z", "2024-03-01T10:18:00Z", 2L, 21.0)))
  }

  test("runBatchesTwo stream-stream join: cross-batch state joins, late pair never forms") {
    // the e_stream_join fixture trajectory, pinned: V1·P11 in-batch,
    // V3 joins step-1's P13 (right state retained), P12 joins step-1's V2
    // (left state retained); after the step-3 sentinel pushes the global
    // watermark to 19:50, the step-4 late pair (V9 would match P11, P19
    // would match V2 in a batch run) must emit NOTHING.
    def ev(id: Long, ts: String, u: Long, typ: String, v: Double): String =
      s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":$u,"event_type":"$typ","value":$v}"""
    val steps = Seq(
      (Seq(ev(1, "10:00", 1, "view", 1), ev(2, "10:02", 2, "view", 2)),
        Seq(ev(11, "10:05", 1, "purchase", 9), ev(13, "10:06", 3, "purchase", 7))),
      (Seq(ev(3, "10:04", 3, "view", 3)), Seq(ev(12, "10:10", 2, "purchase", 8))),
      (Seq(ev(80, "20:00", 99, "view", 0)), Seq(ev(81, "20:00", 98, "purchase", 0))),
      (Seq(ev(9, "10:01", 1, "view", 4)), Seq(ev(19, "10:03", 2, "purchase", 6))),
    )
    val got = graft.streaming.StreamHarness.runBatchesTwo(spark, steps,
      (l, r) => EventStream.intervalJoin(l, r, within = "15 minutes"))
      .filter(col("user_id") < 90)
      .orderBy(col("user_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
      .toSeq
    assert(got == Seq((1L, 1L, 11L), (2L, 2L, 12L), (3L, 3L, 13L)))
  }
}
