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

  /** SLIDING-window counts — each event contributes to
    * length/slide overlapping windows (the trailing-window rate monitor:
    * "events in the last 2 h, refreshed hourly"). Same plan batch and
    * streaming (watermark bounds open windows; state per key is
    * length/slide window panes). Exact BIGINT counts; window starts
    * render at second precision (the stream-window contract).
    *
    * @return (window_start, event_type, n); no ordering is applied — a
    *         total order cannot hold in streaming mode, so batch callers
    *         (e.g. the e_sliding_window query) add their own orderBy */
  def slidingCounts(
      events: DataFrame,
      windowLength: String = "2 hours",
      slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** Per-window top-k categories by exact count — windowed heavy hitters
    * ("trending event types this hour"), the rank companion of
    * [[slidingCounts]]: which k categories dominated each tumbling
    * window, with their exact counts and dense 1..k ranks.
    *
    * Scale/streaming shape: stage 1 — the per-(window, category) count —
    * is a single watermarkable streaming aggregation; the rank cut is a
    * per-window window function over |categories|-bounded rows, run
    * batch-side (foreachBatch over the counts sink in a live stream,
    * plain composition here — the [[windowedDrift]] deployment shape).
    * The rank window partitions BY WINDOW, so it parallelizes across
    * windows and never sees more than |categories| rows per partition —
    * no global sort, no single-partition WindowExec.
    *
    * Determinism: counts are exact BIGINTs and ties break (n desc,
    * category asc) — bit-identical under any partitioning.
    *
    * @return one row per (window, top-k category):
    *         (window_start, category, n, rank), ordered */
  def windowedTopK(
      events: DataFrame,
      category: org.apache.spark.sql.Column,
      windowLength: String = "1 hour",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"windowedTopK: k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_w"))
      .orderBy(col("n").desc, col("category").asc)
    events
      .withColumn("_c", category.cast("string"))
      .groupBy(window(col("ts"), windowLength).as("_w"), col("_c"))
      .agg(count(lit(1)).as("n"))
      .withColumnRenamed("_c", "category")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(date_format(col("_w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("category"), col("n"), col("rank"))
      .orderBy(col("window_start"), col("rank"))
  }

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

  /** Per-window categorical distribution drift vs a fixed reference —
    * the streaming drift monitor behind "did this hour's traffic mix
    * shift from the trained distribution": for each tumbling event-time
    * window, the PSI of `category`'s distribution against broadcast
    * reference counts, with every non-reference category folded into an
    * `<other>` bucket so no mass silently vanishes (the
    * [[graft.operators.LanguageModel.vocabularyDrift]] fold, windowed).
    *
    * Laplace-smoothed shares over the |C|+1 slots are exact rationals;
    * per-category contributions are rounded to integer NANO units
    * (round(x·10⁹) → BIGINT) and long-summed, and every shipped column
    * is BIGINT or string (no DECIMAL and no raw double ships — the
    * r6→r9 oracle discipline in its final form). Gate as in
    * [[graft.operators.DataQuality.psiDrift]], in nano units:
    * psi_n9 < 1e8 stable, > 2.5e8 shifted.
    *
    * Scale/streaming shape: stage 1 — the per-(window, category) count —
    * is a single watermarkable streaming aggregation (`window()` group);
    * the PSI assembly is a tiny per-window re-aggregation over
    * |C|+1-bounded rows, run batch-side (foreachBatch over the counts
    * sink in a live stream, plain composition here). The reference is
    * |C| rows, always broadcast.
    *
    * @param reference (category, ref_n) counts defining the expected mix
    * @return one row per (window, category incl. `<other>`):
    *         (window_start, category, n, contrib_n9, psi_n9), ordered */
  def windowedDrift(
      events: DataFrame,
      category: org.apache.spark.sql.Column,
      reference: DataFrame,
      windowLength: String = "1 hour"): DataFrame = {
    val ref = reference
      .select(col("category").cast("string").as("category"),
        col("ref_n").cast("long").as("ref_n"))
      .filter(col("category").isNotNull)
      .localCheckpoint(false) // sizes + grid both read it
    val counts = events
      .withColumn("_c", category.cast("string"))
      .groupBy(window(col("ts"), windowLength).as("_w"), col("_c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val refStats = ref.agg(
      count(lit(1)).as("_n_cats"), sum(col("ref_n")).as("_ref_total"))
    // fold non-reference categories (and NULL) into <other> per window
    val folded = counts
      .join(broadcast(ref.select(col("category").as("_c"), lit(1).as("_in_ref"))),
        Seq("_c"), "left")
      .withColumn("_cat",
        when(col("_in_ref").isNotNull, col("_c")).otherwise(lit("<other>")))
      .groupBy(col("_w"), col("_cat")).agg(sum(col("n")).as("n"))
    val wins = folded.groupBy(col("_w")).agg(sum(col("n")).as("_n_w"))
    val catSpace = ref.select(col("category"), col("ref_n"))
      .unionByName(ref.sparkSession.range(1)
        .select(lit("<other>").as("category"), lit(0L).as("ref_n")))
    val grid = wins
      .crossJoin(broadcast(catSpace))
      .join(folded.withColumnRenamed("_cat", "category"), Seq("_w", "category"), "left")
      .crossJoin(broadcast(refStats))
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val slots = col("_n_cats") + lit(1L)
    val p = (col("n") + lit(1L)).cast("double") / (col("_n_w") + slots)
    val q = (col("ref_n") + lit(1L)).cast("double") / (col("_ref_total") + slots)
    val withContrib = grid
      .withColumn("contrib_n9", round((p - q) * log(p / q) * lit(1e9)).cast("long"))
      .localCheckpoint(false)
    val psi = withContrib.groupBy(col("_w"))
      .agg(sum(col("contrib_n9")).as("psi_n9"))
    withContrib
      .join(psi, Seq("_w"))
      // string-rendered window start: the proven cross-engine timestamp
      // parity shape (e_stream_window precedent). Seconds resolution so
      // sub-minute windowLengths keep distinct output keys.
      .select(date_format(col("_w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("category"), col("n"), col("contrib_n9"), col("psi_n9"))
      .orderBy(col("window_start"), col("category"))
  }

  /** Windowed Wasserstein-1 drift monitor — the EXACT-arithmetic sibling
    * of [[windowedDrift]]: per tumbling window, the binned earth-mover
    * distance between the window's numeric distribution and a reference
    * histogram. Where the PSI monitor's ln forces a pinned oracle, every
    * number here is an exact BIGINT (clamped equal-width bins, cumulative
    * counts, |cum_w·t_ref − cum_ref·t_w| numerators) until two trailing
    * IEEE ops — a live re-derivation replays bit-identically on any
    * engine.
    *
    * Streaming shape: stage 1 is a (window, bucket) count aggregation —
    * watermarkable, append-mode-safe; the per-window CDF assembly runs
    * over |buckets| rows per window (a foreachBatch/batch-twin stage,
    * same deployment split as [[windowedDrift]]). The reference is
    * |buckets| rows, always broadcast.
    *
    * @param reference (bucket, ref_n) binned counts of the expected
    *                  distribution (bucket in [0, buckets))
    * @return one row per (window, bucket): (window_start, bucket, n,
    *         cum_n, diff_num, w1_num, w1), ordered */
  def windowedWassersteinDrift(
      events: DataFrame,
      value: org.apache.spark.sql.Column,
      reference: DataFrame,
      lo: Long, hi: Long, buckets: Int,
      windowLength: String = "1 hour"): DataFrame = {
    require(buckets >= 2, s"windowedWassersteinDrift: buckets must be >= 2, got $buckets")
    require(hi > lo, s"windowedWassersteinDrift: need hi > lo, got [$lo, $hi)")
    val ref = reference
      .select(col("bucket").cast("int").as("bucket"),
        col("ref_n").cast("long").as("ref_n"))
      .filter(col("bucket").isNotNull && col("bucket") >= 0 && col("bucket") < buckets)
      .localCheckpoint(false)
    val counts = events
      .filter(value.isNotNull)
      .withColumn("_b", least(lit(buckets - 1), greatest(lit(0),
        floor((value.cast("double") - lit(lo)) * lit(buckets) / lit((hi - lo).toDouble))
          .cast("int"))))
      .groupBy(window(col("ts"), windowLength).as("_w"), col("_b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val refStats = ref.agg(
      coalesce(sum(col("ref_n")), lit(0L)).as("_t_ref"))
    val bins = ref.sparkSession.range(buckets).select(col("id").cast("int").as("bucket"))
      .join(ref, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ref_n"), lit(0L)).as("ref_n"))
    val wins = counts.groupBy(col("_w")).agg(sum(col("n")).as("_t_w"))
    val cumWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_w")).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val grid = wins
      .crossJoin(broadcast(bins))
      .join(counts.withColumnRenamed("_b", "bucket"), Seq("_w", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum_n", sum(col("n")).over(cumWin))
      .withColumn("_cum_ref", sum(col("ref_n")).over(cumWin))
      .crossJoin(broadcast(refStats))
      // emptiness guard rides inside the surviving column (ksDrift lesson)
      .withColumn("diff_num",
        abs(col("cum_n") * when(col("_t_ref") > 0L, col("_t_ref")).otherwise(
          raise_error(lit("windowedWassersteinDrift: empty reference")).cast("long"))
          - col("_cum_ref") * col("_t_w")))
      .localCheckpoint(false)
    val binWidth = (hi - lo).toDouble / buckets
    val w1 = grid.groupBy(col("_w"))
      .agg(sum(col("diff_num")).as("w1_num"),
        first(col("_t_w")).as("_tw"), first(col("_t_ref")).as("_tr"))
      .select(col("_w"),
        col("w1_num"),
        (col("w1_num").cast("double") / (col("_tw") * col("_tr")).cast("double")
          * lit(binWidth)).as("w1"))
    grid
      .join(w1, Seq("_w"))
      .select(date_format(col("_w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("bucket"), col("n"), col("cum_n"), col("diff_num"),
        col("w1_num"), col("w1"))
      .orderBy(col("window_start"), col("bucket"))
  }

  final case class SessionEvent(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class GapSessionState(start: Long, last: Long, n: Long, total: Double)
  final case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n: Long, sum_value: Double)

  /** Gap-based sessionization with ARBITRARY keyed state —
    * `flatMapGroupsWithState` + event-time timeout (round-13, the one
    * Structured Streaming state primitive the built-in `session_window`
    * doesn't exercise: custom state shape, explicit timeout lifecycle,
    * multi-row emission). A user's session closes two ways, both exact:
    *  - SUPERSESSION: a new event more than `gapMinutes` after the
    *    session's last event closes it in-line (emitted that batch) and
    *    opens the next;
    *  - TIMEOUT: the watermark passing last-event + gap fires
    *    `hasTimedOut` for keys with no new data — the state is emitted
    *    and evicted, so idle keys never grow the store (the 100 TB state
    *    bound).
    * Within a batch a key's rows are ts-sorted before folding, so the
    * emitted sessions are a pure function of (fixture, batch split);
    * across batches the event-time timeout makes emission content
    * identical no matter WHICH batch fires it — the batch-twin oracle is
    * plain LAG-gap sessionization over the same rows. session_start
    * tracks min(ts) (not first-arrival ts), so a cross-batch out-of-order
    * event that extends a session backwards still matches the oracle's
    * min(ts). One residual scope on the oracle claim: session MEMBERSHIP
    * is arrival-order-dependent (an out-of-order event joins the session
    * open at arrival time), so a cross-batch reordering that would have
    * CHANGED the sorted gap structure — e.g. an event bridging what the
    * sorted order sees as two sessions — still diverges from the LAG
    * twin; fixtures must keep per-user cross-batch events gap-structure
    * preserving.
    *
    * @return append stream of closed sessions
    *         (user_id, session_start, session_end, n, sum_value) */
  def gapSessions(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"): DataFrame = {
    require(gapMinutes >= 1, s"gapSessions: gapMinutes must be >= 1, got $gapMinutes")
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapSessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[GapSessionState]) =>
          def close(s: GapSessionState): ClosedSession = ClosedSession(
            user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, s.total)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // ts-sort within the batch: the iterator order is not defined
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Vector.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  out += close(s)
                  cur = Some(GapSessionState(t, t, 1L, e.value))
                case Some(s) =>
                  // min on start: a cross-batch out-of-order event admitted
                  // above the watermark with t < s.start still belongs to
                  // this session, and the batch-twin LAG oracle reports
                  // min(ts) as session_start — without the min the stream
                  // would report the arrival-order first ts instead.
                  cur = Some(GapSessionState(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1L, s.total + e.value))
                case None =>
                  cur = Some(GapSessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
      }
      .toDF()
  }

  /** The [[gapSessions]] contract re-implemented on the
    * `transformWithState` runtime (the Spark 4.x StatefulProcessor API —
    * typed `ValueState`, EXPLICIT event-time timers via
    * `registerTimer`/`handleExpiredTimer`, and the RocksDB state store
    * provider the API requires): the modern replacement for
    * `flatMapGroupsWithState` that production streams migrate to, so the
    * engine carries both. Semantics are identical by construction — the
    * same ts-sorted in-batch fold, supersession closes in-line, the
    * timer at last-event + gap fires when the watermark passes it
    * (stale timers are deleted on every state move, and the expiry
    * handler guards against one anyway) — so the batch-twin LAG oracle
    * and the [[gapSessions]] trajectory both hold verbatim.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the running session (StreamHarness
    * callers pass it via the conf overlay). */
  def gapSessionsTws(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"): DataFrame = {
    require(gapMinutes >= 1, s"gapSessionsTws: gapMinutes must be >= 1, got $gapMinutes")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new GapSessionProcessor(gapMinutes * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  /** StatefulProcessor behind [[gapSessionsTws]]. One ValueState per
    * user (no TTL — the timer IS the eviction path); timer discipline:
    * exactly one live timer per key, moved forward whenever the session
    * extends. */
  final class GapSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessionEvent, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}

    @transient private var state: ValueState[GapSessionState] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[GapSessionState]("session",
        org.apache.spark.sql.Encoders.product[GapSessionState], TTLConfig.NONE)

    private def close(user: Long, s: GapSessionState): ClosedSession = ClosedSession(
      user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.total)

    override def handleInputRows(
        user: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      val out = Vector.newBuilder[ClosedSession]
      var cur = if (state.exists()) Option(state.get()) else None
      val prevTimer = cur.map(_.last + gapMs)
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last > gapMs =>
            out += close(user, s)
            cur = Some(GapSessionState(t, t, 1L, e.value))
          case Some(s) =>
            // same min-on-start fold as gapSessions — the two state
            // runtimes must agree row-for-row (see gapSessions for why)
            cur = Some(GapSessionState(math.min(s.start, t), math.max(s.last, t),
              s.n + 1L, s.total + e.value))
          case None =>
            cur = Some(GapSessionState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        val timer = s.last + gapMs
        prevTimer.filter(_ != timer).foreach(getHandle.deleteTimer)
        if (!prevTimer.contains(timer)) getHandle.registerTimer(timer)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (state.exists()) {
        val s = state.get()
        // a timer superseded by a later session extension is stale —
        // deleted on update, but guard against provider races anyway
        if (expiredTimerInfo.getExpiryTimeInMs() >= s.last + gapMs) {
          state.clear()
          Iterator.single(close(user, s))
        } else Iterator.empty
      } else Iterator.empty
    }
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
