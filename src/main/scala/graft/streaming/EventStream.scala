package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming ingest (SURVEY.md §2.7: the reference is batch-only;
  * this is the engine's incremental path — file-arrival ingest of new
  * assay/event data with watermarked windowed aggregation and stateful
  * sessionization).
  *
  * Batch/stream parity: [[windowedCounts]] accepts either a static or a
  * streaming DataFrame — the same plan serves `e_stream_window` (batch
  * oracle query) and the readStream path (exercised in StreamingSpec via
  * the in-memory sink).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
  ))

  /** File-arrival streaming source over a directory of JSON-lines events. */
  def readEventStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).json(path)

  /** Tumbling-window counts with a 10-minute watermark for late data. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per user (the built-in `session_window`
    * keyed state): a session closes after `gap` of inactivity. The same
    * plan runs batch (the `e_session_window` oracle query) and streaming
    * (watermark bounds the open-session state; append emits closed
    * sessions). */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      aggs: Seq[org.apache.spark.sql.Column] =
        Seq(count(lit(1)).as("n"), sum(col("value")).as("sum_value")),
  ): DataFrame = {
    require(aggs.nonEmpty, "sessionWindows: aggs must be non-empty")
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Streaming exact dedup on a content fingerprint: state is bounded by
    * the watermark (`dropDuplicatesWithinWatermark` — duplicates arriving
    * inside the lateness horizon are dropped, state beyond it is evicted;
    * the streaming counterpart of `Dedup.exact` for ingest pipelines).
    * NULL-fingerprint parity with `Dedup.exact`: a null fingerprint
    * proves nothing about content equality, so each such event gets a
    * unique secondary key and never collapses with another (the state
    * key treats nulls as equal otherwise — silent event loss). */
  def streamingDedup(events: DataFrame, fingerprint: org.apache.spark.sql.Column): DataFrame =
    events
      .withColumn("fingerprint", fingerprint)
      .withColumn("_dd_nullkey", when(col("fingerprint").isNull, expr("uuid()")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fingerprint", "_dd_nullkey")
      .drop("_dd_nullkey")

  /** Stream-stream interval join (the view→conversion attribution shape):
    * every left event pairs with same-key right events occurring within
    * `within` AFTER it (inclusive on both ends).
    *
    * Scale/state shape: both sides carry watermarks and the join
    * condition bounds the event-time range, so Spark derives a state
    * horizon for BOTH buffers — neither side's join state outlives
    * watermark + `within`, no matter how long the streams run. The
    * equi-key (`user_id`) keeps it a hash join; at 100 TB the hot-key
    * concern is the same as any keyed shuffle (AQE skew handling batch
    * side; keyed state distribution stream side).
    *
    * Batch/stream parity: `withWatermark` is a no-op on static frames, so
    * the identical plan serves the `e_interval_join` batch oracle and the
    * streaming path (StreamingSpec drives two file-arrival streams into
    * the memory sink and compares against the batch twin). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      within: String = "15 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    // left_outer: a left event with no same-key right event in its window
    // still emits (null right side) — but only once the right watermark
    // passes the window end, when absence is PROVEN; state stays bounded
    // exactly as in the inner case. Batch runs emit null-padded rows
    // immediately (no watermark semantics on static frames).
    require(Set("inner", "left_outer")(joinType),
      s"intervalJoin: joinType must be inner or left_outer, got $joinType")
    val l = left.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
      col("user_id"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
      col("user_id").as("r_user_id"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"),
      joinType)
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }

  final case class Event(event_id: Long, user_id: Long, value: Double)
  final case class SessionState(n: Long, total: Double)
  final case class SessionUpdate(user_id: Long, n: Long, total: Double)

  /** Stateful per-user running aggregate via mapGroupsWithState — the
    * custom-state template (KeyValueGroupedDataset) for operators the
    * built-in aggregations can't express.
    *
    * State is BOUNDED: a user idle for `idleTimeout` has its state
    * evicted (final totals re-emitted at eviction) — with `NoTimeout`, a
    * growing user-id space would grow the state store monotonically until
    * executor OOM. Batch runs ignore timeouts (every group is complete
    * within the run). */
  def sessionize(
      events: org.apache.spark.sql.Dataset[Event],
      idleTimeout: String = "1 hour",
  ): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            SessionUpdate(user, last.n, last.total)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
            var n = prev.n
            var total = prev.total
            rows.foreach { e => n += 1; total += e.value }
            state.update(SessionState(n, total))
            state.setTimeoutDuration(idleTimeout)
            SessionUpdate(user, n, total)
          }
      }
      .toDF()
  }
}
