package graft

import graft.fdr.TargetDecoy
import graft.functions.{PeptideFunctions, TextFunctions, UsiFunctions}
import graft.operators.{Dedup, Similarity, SpectraCluster}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/time-series + data-quality + multimodal registry (e_*, dq_*, mm_*) — one slice of the SURVEY.md §2 operator inventory,
  * split out of the single Queries registry in round 11 purely for
  * maintainability; keys, semantics, and oracles are unchanged and are
  * consumed only through [[Queries]]. Oracle-parity conventions are
  * documented on [[Queries]]. */
private[graft] object QueriesEventsQuality {
  import QueryShared._

  // ---- watermark/late-data fixtures (round-12): one inner Seq = one
  // micro-batch (StreamHarness enforces the order). All values integral so
  // double sums are exact; margins chosen so boundary conventions cannot
  // change the output (see LateDataSpec).
  private def fxEv(id: Long, ts: String, typ: String, v: Double): String =
    s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":1,"event_type":"$typ","value":$v}"""

  private[graft] val lateDataBatches: Seq[Seq[String]] = Seq(
    Seq(fxEv(1, "10:00", "a", 1), fxEv(2, "10:20", "a", 2), fxEv(3, "10:50", "b", 3),
      fxEv(4, "11:05", "a", 4)),
    Seq(fxEv(5, "10:58", "b", 5), fxEv(6, "10:30", "a", 6), fxEv(7, "11:40", "a", 7),
      fxEv(8, "12:10", "b", 8)),
    Seq(fxEv(9, "10:45", "a", 100) /* LATE: window closed at wm 12:00 */,
      fxEv(10, "12:30", "a", 9)),
    // double sentinel: flushes every real window regardless of the
    // trailing no-data batch; its own 23:00 window never emits
    Seq(fxEv(99, "23:00", "z", 0)),
    Seq(fxEv(100, "23:30", "z", 0)),
  )

  private[graft] val watermarkDedupBatches: Seq[Seq[String]] = Seq(
    Seq(fxEv(1, "10:00", "a", 1), fxEv(2, "10:01", "b", 2)),
    Seq(fxEv(3, "10:05", "a", 3) /* dup of live fpA state */, fxEv(4, "10:30", "c", 4)),
    // wm = 10:20: fpA/fpB state (evict at ts+10min = 10:10/10:11) gone ->
    // 5 and 6 re-admit; fpC (evict 10:40) alive -> 7 drops
    Seq(fxEv(5, "10:35", "a", 5), fxEv(6, "10:36", "b", 6), fxEv(7, "10:37", "c", 7)),
  )

  // ---- stateful-session fixture (round-13): per-user events with a
  // user_id column; gap = 30 min, watermark delay = 10 min. Margins are
  // wide (closest timeout 10:48 vs watermark values 10:00/10:52/12:50,
  // in-session gaps <= 13 min, supersession gaps >= 44 min) so >/>= conventions
  // on the gap cut and the timeout fire cannot change the output.
  // Session u1-A (10:00-10:10) closes by SUPERSESSION at 11:02 (batch 2);
  // u2 (10:05-10:18, timeout 10:48) fires under wm 10:52 (batch 3);
  // u1-B (11:02, timeout 11:32) fires under wm 12:50 (batch 4). The
  // double sentinel (user 99, filtered from the output) drives the
  // watermark; its own state never emits.
  private def fxEvU(id: Long, ts: String, user: Long, typ: String, v: Double): String =
    s"""{"event_id":$id,"ts":"2024-03-01T$ts:00.000Z","user_id":$user,"event_type":"$typ","value":$v}"""

  private[graft] val statefulSessionBatches: Seq[Seq[String]] = Seq(
    Seq(fxEvU(1, "10:00", 1, "a", 1), fxEvU(2, "10:10", 1, "a", 2),
      fxEvU(3, "10:05", 2, "b", 10)),
    Seq(fxEvU(4, "11:02", 1, "a", 3), fxEvU(5, "10:18", 2, "b", 11)),
    Seq(fxEvU(90, "13:00", 99, "z", 0)),
    Seq(fxEvU(91, "13:30", 99, "z", 0)),
  )

  // ---- stream-stream join fixture (round-13): views (left) joined to
  // purchases (right) on user_id within [l_ts, l_ts + 15 min]; watermark
  // delay 10 min on BOTH sides. Each step lands one file per source in
  // ONE micro-batch, so the global watermark (min across sources − 10
  // min) is a pure function of the fixture. Trajectory: step 1 — V1·P11
  // match in-batch; step 2 — V3 matches step-1's P13 (right state
  // retained) and P12 matches step-1's V2 (left state retained), wm 09:52
  // admits everything by >= 12 min; step 3 — the double sentinel (users
  // 98/99, filtered from the output) advances the watermark to 19:50;
  // step 4 — V9/P19 arrive ~10 HOURS late, far past every plausible
  // eviction reading (state gone AND below the input watermark), so the
  // batch-twin pairs (V9·P11, V2·P19) must NOT appear. Margins are wide
  // enough that >=/> boundary conventions cannot change the output
  // (StreamingSpec pins the run).
  private[graft] val streamJoinBatches: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq(fxEvU(1, "10:00", 1, "view", 1), fxEvU(2, "10:02", 2, "view", 2)),
      Seq(fxEvU(11, "10:05", 1, "purchase", 9), fxEvU(13, "10:06", 3, "purchase", 7))),
    (Seq(fxEvU(3, "10:04", 3, "view", 3)),
      Seq(fxEvU(12, "10:10", 2, "purchase", 8))),
    (Seq(fxEvU(80, "20:00", 99, "view", 0)),
      Seq(fxEvU(81, "20:00", 98, "purchase", 0))),
    (Seq(fxEvU(9, "10:01", 1, "view", 4)),
      Seq(fxEvU(19, "10:03", 2, "purchase", 6))),
  )

  // ---- stream-stream LEFT OUTER join fixture (round-14): same
  // views x purchases shape, but exercising the one join mode the inner
  // fixture can't — null-side emission forced by watermark advance, the
  // trickiest state-eviction semantics in Structured Streaming (an
  // unmatched left row emits (l, null) only when the global watermark
  // passes l_ts + 15 min, PROVING no future right row can match; a row
  // still in state at query stop never emits). Trajectory: step 1 is
  // LEFT-ONLY (the right source has emitted nothing, so its watermark
  // contribution is the EPOCH — the one-sided-arrival case the r13
  // ADVICE flagged as oracle-untested); step 2 — V1·P11 and V3·P13
  // match (left state retained across the step), V2 (u2) never matches;
  // steps 3+4 — double sentinel (u98/u99, filtered from the output)
  // advances the watermark input to 19:50 at step 3's end, so step 4's
  // batch provably runs eviction: V2's window end 10:17 << 19:50 forces
  // the (V2, null) emission, while the step-3 sentinel's own window end
  // 20:15 stays above every watermark the run can reach after being
  // filtered anyway; step 5 — V9/P29 arrive ~10 h late (below wm
  // 20:20), so they are dropped on input: no pair, and crucially NO
  // (V9, null) row either — a late-dropped left row must not
  // masquerade as a proven-unmatched one. The LAST step adds no newer
  // ts, so the final watermark (20:20) is identical whether or not a
  // trailing no-data micro-batch sneaks in before stop — every
  // emission is margin-protected by >= 25 min against >/>= eviction
  // conventions.
  private[graft] val streamJoinOuterBatches: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq(fxEvU(1, "10:00", 1, "view", 1), fxEvU(2, "10:02", 2, "view", 2),
      fxEvU(3, "10:04", 3, "view", 3)),
      Seq.empty),
    (Seq.empty,
      Seq(fxEvU(11, "10:05", 1, "purchase", 9), fxEvU(13, "10:06", 3, "purchase", 7))),
    (Seq(fxEvU(80, "20:00", 99, "view", 0)),
      Seq(fxEvU(81, "20:00", 98, "purchase", 0))),
    (Seq(fxEvU(82, "20:30", 99, "view", 0)),
      Seq(fxEvU(83, "20:30", 98, "purchase", 0))),
    (Seq(fxEvU(9, "10:01", 1, "view", 4)),
      Seq(fxEvU(29, "10:03", 2, "purchase", 6))),
  )

  // the session fixture as DuckDB VALUES rows, WITH the user_id column
  private def fxValuesU(batches: Seq[Seq[String]]): String =
    batches.zipWithIndex.flatMap { case (lines, i) =>
      lines.map { l =>
        val id = "\"event_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1)
        val ts = "\"ts\":\"2024-03-01T(\\d+:\\d+):00".r.findFirstMatchIn(l).get.group(1)
        val u = "\"user_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1)
        val v = "\"value\":(\\d+(?:\\.\\d+)?)".r.findFirstMatchIn(l).get.group(1)
        s"(${i + 1}, $id, TIMESTAMP '2024-03-01 $ts:00', $u, ${v}::DOUBLE)"
      }
    }.mkString(", ")

  // the same fixtures as DuckDB VALUES rows: (batch, event_id, ts, event_type, value)
  private def fxValues(batches: Seq[Seq[String]]): String =
    batches.zipWithIndex.flatMap { case (lines, i) =>
      lines.map { l =>
        val id = "\"event_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1)
        val ts = "\"ts\":\"2024-03-01T(\\d+:\\d+):00".r.findFirstMatchIn(l).get.group(1)
        val ty = "\"event_type\":\"(\\w+)\"".r.findFirstMatchIn(l).get.group(1)
        val v = "\"value\":(\\d+(?:\\.\\d+)?)".r.findFirstMatchIn(l).get.group(1)
        s"(${i + 1}, $id, TIMESTAMP '2024-03-01 $ts:00', '$ty', ${v}::DOUBLE)"
      }
    }.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_ks_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.DataQuality.ksDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("n_chars"), lo = 0L, hi = 600L, buckets = 12)
    }),

    // Exact Gini concentration coefficient (round-12): integer rank-
    // range sums over the tie-grouped histogram; one trailing division.
    "dq_gini" -> ((s, dir) => {
      graft.operators.DataQuality.giniCoefficient(
        t(s, dir, "documents"), col("n_chars"))
    }),

    // CUSUM change-point statistic (round-12): the sequential
    // max(0, S+x-bias) recursion computed CLOSED-FORM as prefix-sum
    // minus running-min — two windows, one pass per key, pure BIGINT
    // over the centi-quantized value.
    "e_cusum_changepoint" -> ((s, dir) => {
      graft.operators.TimeSeries.cusumChangepoint(
        t(s, dir, "events").filter(col("ts").isNotNull),
        col("event_type"), Seq(col("ts"), col("event_id")),
        floor(col("value") * 100), bias = 5200L, threshold = 50000L)
        .select(col("key").as("event_type"), col("ord1").as("event_id"),
          col("value").as("v100"), col("cusum"), col("alarm"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Exact Mann-Whitney U rank-sum test (round-12): the nonparametric
    // cohort-shift test over the centi-quantized event value, doubled-U
    // BIGINT statistics from the tie-grouped value histogram, fixed-
    // association z (one sqrt, no transcendental, no rounding needed).
    "dq_mann_whitney" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("v100"))
        .filter(col("user_id").isNotNull)
      graft.operators.DataQuality.mannWhitneyU(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        col("v100"))
    }),

    // Wasserstein-1 drift (round-9): same grid as dq_ks_drift but the
    // earth-mover statistic — exact-integer CDF-difference numerators,
    // two trailing IEEE ops, no transcendental and no smoothing.
    "dq_wasserstein_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.DataQuality.wassersteinDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("n_chars"), lo = 0L, hi = 600L, buckets = 12)
    }),

    // Benford first-digit audit (round-10) on order-line amounts in
    // cents — the fabricated-numbers / truncated-extract tripwire. Pure
    // exact-integer contract: leading digits from integer rendering,
    // reviewed nano-share constants (no runtime log10), BIGINT deviation
    // and total-variation columns.
    "dq_benford" -> ((s, dir) => {
      graft.operators.DataQuality.benfordAudit(
        t(s, dir, "lineitem"),
        floor(col("l_extendedprice") * lit(100)).cast("long"))
    }),

    // Chi-square independence between corpus facets (source × lang):
    // observed cells + independence expectations, chi2 via the closed
    // form Σ o²/e − n (absent cells never materialized), round-to-nano
    // long-summed terms.
    "dq_chi_square" -> ((s, dir) => {
      graft.operators.DataQuality.chiSquare(
        t(s, dir, "documents"), col("source"), col("lang"))
    }),

    // PPS (size-weighted Poisson) sampling with Horvitz-Thompson
    // weights: expected-100-doc sample, inclusion probability
    // proportional to document length; one 1-row total broadcast back
    // as a pure filter + weight projection.
    "e_downsample_ohlc" -> ((s, dir) => {
      graft.operators.TimeSeries.downsampleOhlc(
        t(s, dir, "events"), col("ts"), col("event_id"), col("value"),
        widthSeconds = 3600L, keys = Seq(col("event_type")))
        .select(col("event_type"), col("bucket"), col("bucket_start"),
          col("open"), col("close"), col("high"), col("low"), col("volume"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // Per-user arrival-gap diagnostics: lag window partitioned by user
    // (parallel across keys) + one hash agg sharing the same shuffle;
    // gaps > 60 s counted, max/mean exact micros arithmetic.
    "e_gap_stats" -> ((s, dir) => {
      graft.operators.TimeSeries.gapStats(
        t(s, dir, "events").filter(col("user_id").isNotNull),
        col("user_id"), col("ts"), gapSeconds = 60L)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"))
    }),

    // JS vocabulary drift between corpus halves: the textual PSI —
    // top-25-union vocab + <oov> fold, Laplace shares, 9-dp
    // decimal-summed JS contributions (js in [0, ln 2]).
    "e_funnel" -> ((s, dir) => {
      graft.operators.TimeSeries.funnel(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
        .withColumnRenamed("user", "user_id")
        .orderBy(col("user_id"))
    }),

    // Weekly cohort retention triangle: first-seen bucket join + one
    // (cohort, offset) distinct count.
    "e_cohort_retention" -> ((s, dir) => {
      graft.operators.TimeSeries.cohortRetention(
        t(s, dir, "events"), col("user_id"), col("ts"), widthSeconds = 604800L)
        .orderBy(col("cohort"), col("offset"))
    }),

    // Hybrid-retrieval fusion: BM25 lexical top-10 + brute-force cosine
    // top-10 for embedding query 3, reciprocal-rank fused (k=60). Both
    // input rankings are already top-k bounded, so the fusion is a
    // broadcast-sized full-outer join + bounded cut.
    "dq_profile" -> ((s, dir) => {
      graft.operators.DataQuality.profileFrame(t(s, dir, "documents"))
    }),

    // Schema/profile drift between snapshots (round-10): snapshot B
    // simulates a regenerated corpus — n_chars dropped, n_tokens added,
    // lang 10%-nulled — and the diff must surface the one-sided
    // columns, the unchanged dtypes, and the exact null-ppm shift.
    "dq_schema_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 2 === 0)
      val b = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("lang",
          when(col("doc_id") % 10 === 1, lit(null).cast("string"))
            .otherwise(col("lang")))
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .drop("n_chars")
      graft.operators.DataQuality.schemaDrift(a, b)
    }),

    // Language-ID accuracy audit: confusion matrix of the n-gram
    // heuristic against the labeled lang column, with per-cell recall
    // share (diagonal = class recall). Cells pinned, totals broadcast.
    "dq_langid_confusion" -> ((s, dir) => {
      graft.operators.DataQuality.confusionMatrix(
        t(s, dir, "documents").select(col("lang"),
          TextFunctions.langIdHeuristic(col("text")).as("pred")),
        col("lang"), col("pred"))
    }),

    // Cohen's kappa between the gold lang label and the heuristic
    // prediction — chance-corrected agreement over the same joint counts
    // the confusion matrix reports. Every division is a single exactly-
    // rounded IEEE op over exact integers (no rounding discipline needed).
    "dq_cohen_kappa" -> ((s, dir) => {
      graft.operators.DataQuality.cohenKappa(
        t(s, dir, "documents").select(col("lang"),
          TextFunctions.langIdHeuristic(col("text")).as("pred")),
        col("lang"), col("pred"))
    }),

    // Fleiss' kappa (round-13): many-rater chance-corrected agreement —
    // panel = each user's FIRST 5 events (ts, event_id order), category =
    // event_type; users with fewer than 5 events are excluded by the
    // operator's fixed-panel gate (both branches exercised). All sums
    // exact BIGINTs, three single exactly-rounded divisions.
    "dq_fleiss_kappa" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val panel = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 5)
      graft.operators.DataQuality.fleissKappa(
        panel, col("user_id"), col("event_type"), n = 5)
    }),

    // pass@k (round-9): HumanEval-style unbiased estimator per user task
    // group — fixed-order IEEE product fold, n<k NULL, n-c<k exactly 1.
    "dq_k_anonymity" -> ((s, dir) => {
      graft.operators.DataQuality.kAnonymity(
        t(s, dir, "events"),
        Seq(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"),
          expr("cast(floor(value / 100) as bigint)")),
        k = 5L)
    }),

    // Referential-integrity audits (round-9): the two FK contracts the
    // TPC-H-ish join queries trust (lineitem→orders, orders→customer),
    // unioned with a labeled row each.
    "dq_ref_integrity" -> ((s, dir) => {
      import graft.operators.DataQuality
      DataQuality.referentialIntegrity(
        t(s, dir, "lineitem"), col("l_orderkey"),
        t(s, dir, "orders"), col("o_orderkey"))
        .withColumn("fk", lit("lineitem.l_orderkey->orders"))
        .unionByName(
          DataQuality.referentialIntegrity(
            t(s, dir, "orders"), col("o_custkey"),
            t(s, dir, "customer"), col("c_custkey"))
            .withColumn("fk", lit("orders.o_custkey->customer")))
        .select(col("fk"), col("n_child_rows"), col("n_null_fk"),
          col("n_orphans"), col("intact"))
        .orderBy(col("fk"))
    }),

    // t-closeness audit (round-9): per-class total-variation distance of
    // the event_type distribution vs global — the skewness-attack check
    // completing the k-anonymity / l-diversity privacy triple.
    "dq_t_closeness" -> ((s, dir) => {
      graft.operators.DataQuality.tCloseness(
        t(s, dir, "events"),
        Seq(date_format(col("ts"), "yyyy-MM-dd"),
          expr("cast(floor(value / 100) as bigint)")),
        col("event_type"))
        .withColumnRenamed("q0", "day")
        .withColumnRenamed("q1", "vband")
    }),

    // l-diversity audit (round-9): the homogeneity-attack check on the
    // same quasi-identifiers with event_type as the sensitive value.
    "dq_l_diversity" -> ((s, dir) => {
      graft.operators.DataQuality.lDiversity(
        t(s, dir, "events"),
        Seq(date_format(col("ts"), "yyyy-MM-dd"),
          expr("cast(floor(value / 100) as bigint)")),
        col("event_type"), l = 2L)
    }),

    // EXACT order statistics without a global sort (round-11):
    // distributed selection via integer range-bucket histogram — the
    // third point between Spark's memory-bound exact percentile()
    // (per-group sorted array) and the inexact approx_percentile; only
    // the target ranks' buckets (~n/65536 rows) ever sort. Discrete
    // quantile_disc semantics: rank (n-1)*q div 100 + 1.
    "dq_exact_quantiles" -> ((s, dir) => {
      graft.operators.DataQuality.exactQuantiles(
        t(s, dir, "documents"), col("n_chars"), Seq(1, 25, 50, 75, 99))
    }),

    // Deterministic Pearson correlation (round-9) over quantized
    // lineitem measures — exact integer moments, one IEEE chain; what
    // the float corr() aggregator cannot promise across re-plans.
    "dq_key_audit" -> ((s, dir) => {
      import graft.operators.DataQuality
      def one(name: String, df: DataFrame, k: Column) =
        DataQuality.keyAudit(df, k).withColumn("table_key", lit(name))
      one("documents.doc_id", t(s, dir, "documents"), col("doc_id"))
        .unionByName(one("events.event_id", t(s, dir, "events"), col("event_id")))
        .unionByName(one("lineitem.orderkey_linenumber", t(s, dir, "lineitem"),
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))))
        .select(col("table_key"), col("n_rows"), col("n_null_keys"), col("n_keys"),
          col("n_dup_keys"), col("max_multiplicity"), col("n_excess_rows"))
        .orderBy(col("table_key"))
    }),

    // Robust median/MAD outliers (round-9) per event type: |x - median| >
    // 3·MAD — heavy tails can't drag their own threshold; medians ride
    // the proven percentile/quantile_cont interpolation contract.
    "dq_robust_outliers" -> ((s, dir) => {
      graft.operators.DataQuality.robustOutliers(
        t(s, dir, "events"), col("event_type"), col("value"), k = 3.0)
        .withColumnRenamed("group", "event_type")
    }),

    // Krippendorff's alpha (round-9): multi-annotator nominal agreement
    // over synthetic rating slots (unit = event_id div 10, annotator =
    // event_id % 10, label = event_type) — BIGINT micro fixed-point end
    // to end, integer `div` the only division (picorank discipline).
    "dq_krippendorff_alpha" -> ((s, dir) => {
      graft.operators.DataQuality.krippendorffAlpha(
        t(s, dir, "events").filter(col("event_type").isNotNull),
        expr("event_id div 10"), expr("event_id % 10"), col("event_type"))
    }),

    // Per-source label balance: Shannon entropy + Gini impurity of the
    // lang distribution inside each source — ln rides round-to-nano
    // integer contributions; every shipped column is BIGINT (the r9
    // driver-gate lesson: DECIMAL output columns never hash-match).
    "dq_label_balance" -> ((s, dir) => {
      graft.operators.DataQuality.labelBalance(
        t(s, dir, "documents"), col("source"), col("lang"))
    }),

    // Per-class precision/recall/F1 for the langid heuristic vs the gold
    // label — single-chain exact divisions, NULL where undefined.
    "dq_classification_report" -> ((s, dir) => {
      graft.operators.DataQuality.classificationReport(
        t(s, dir, "documents").select(col("lang"),
          TextFunctions.langIdHeuristic(col("text")).as("pred")),
        col("lang"), col("pred"))
    }),

    // Reliability report for the hashed quality scorer against the
    // lang=en outcome: 10 equal-width score bins on [-0.5, 0.5) with
    // observed positive rate vs exact mean score per bin.
    "dq_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sc = graft.operators.QualityModel.scoreDocs(docs, col("doc_id"), col("text"))
        .select(col("id"), col("score"))
      val lab = docs.select(col("doc_id").as("id"), (col("lang") === "en").as("y"))
      graft.operators.DataQuality.calibrationReport(
        sc.join(lab, Seq("id")), col("score"), col("y"),
        lo = -0.5, hi = 0.5, buckets = 10)
    }),

    // Per-source langid ACCURACY with Wilson 95% bounds — rate plus
    // uncertainty in one exactly-rounded IEEE chain (sqrt included).
    "dq_rate_wilson" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.DataQuality.rateWithWilson(
        docs.select(col("source"),
          (TextFunctions.langIdHeuristic(col("text")) <=> col("lang")).as("ok")),
        col("source"), col("ok"))
    }),

    // Binned ROC-AUC for the same scorer/outcome as dq_calibration —
    // ranking quality next to probability quality. The trapezoid
    // numerator is EXACT BIGINT until one trailing division.
    "dq_binned_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sc = graft.operators.QualityModel.scoreDocs(docs, col("doc_id"), col("text"))
        .select(col("id"), col("score"))
      val lab = docs.select(col("doc_id").as("id"), (col("lang") === "en").as("y"))
      graft.operators.DataQuality.binnedAuc(
        sc.join(lab, Seq("id")), col("score"), col("y"),
        lo = -0.5, hi = 0.5, buckets = 10)
    }),

    // Tokenizer-coverage audit: per-doc OOV rate under the top-20 corpus
    // vocabulary (11 of 31 terms fall outside the cap, so real OOV mass);
    // vocab broadcast, corpus never shuffles by content.
    "e_windowed_drift_fx" -> ((s, _) => {
      import s.implicits._
      val ev = Seq(
        (1L, "2024-01-01 00:05:00", "a"), (2L, "2024-01-01 00:10:00", "a"),
        (3L, "2024-01-01 00:20:00", "b"),
        (4L, "2024-01-01 01:05:00", "b"), (5L, "2024-01-01 01:10:00", "b"),
        (6L, "2024-01-01 01:20:00", "zz"),
      ).toDF("event_id", "ts_str", "event_type")
        .withColumn("ts", to_timestamp(col("ts_str")))
      val ref = Seq(("a", 2L), ("b", 1L)).toDF("category", "ref_n")
      graft.streaming.EventStream.windowedDrift(ev, col("event_type"), ref, "1 hour")
    }),

    // Language-ID heuristic (stopword-lexicon argmax).
    "dq_monotonicity" -> ((s, dir) => {
      graft.operators.DataQuality.monotonicityAudit(
        t(s, dir, "events"),
        floor(col("value") * lit(100)).cast("long"),
        col("event_type") === "click", buckets = 10)
    }),

    // Per-source percentile normalization (round-10): raw scores are
    // only comparable within a source; selection thresholds act on the
    // within-group percentile. Exact-integer cume_dist (ties share a
    // percentile via the RANGE frame; no float, no ordinal tie-break).
    "mm_binary_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          md5(col("text")).as("payload_md5"))
        .orderBy(col("doc_id"))
    }),

    // Perceptual near-dup pairs over REALLY-DECODED rasters (round-12):
    // the corpus = 40 PNG fixtures + their 16x8 thumbnails (the decoded
    // raster 2D-resampled and LOSSLESSLY re-encoded, id + 1000000) + exact
    // re-encodes of the first 10 (id + 2000000 — decode(encode(decode))
    // is identity for PNG, so these MUST pair at hamming 0). Every
    // payload goes through the genuine ImageIO decode before aHash
    // banding (64 block bytes over the PIXEL buffer, mean-threshold bits,
    // 4x16-bit LSH bands, exact Hamming verify <= 3); the oracle
    // re-derives original, thumbnail, and copy rasters from the fixture
    // formula.
    "mm_phash_neardup" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal.{decodeGray, decodeImages, encodeGray, nnResample, MediaRow}
      // NOTE: module METHODS are imported (static access inside the task
      // lambdas), never `val mm = Multimodal` — an aliased module instance
      // is captured as a closure field and objects aren't Serializable.
      val media = syntheticImageRows(s, dir, 40)
      val extras = media.map { r =>
        val Some((w, h, px)) = decodeGray(r.payload)
        MediaRow(r.media_id + 1000000L, "image",
          encodeGray(16, 8, nnResample(px, w, h, 16, 8)), None, None, None)
      }
      val copies = media.filter(_.media_id < 10).map { r =>
        val Some((w, h, px)) = decodeGray(r.payload)
        MediaRow(r.media_id + 2000000L, "image", encodeGray(w, h, px),
          None, None, None)
      }
      val decoded = decodeImages(media.union(extras).union(copies)).toDF()
        .select(col("media_id").as("id"), col("pixels").as("payload"))
      graft.operators.Multimodal.aHashNearDupPairs(
        decoded, col("id"), col("payload"), maxHamming = 3)
    }),

    // REAL multi-batch streaming run, driver-checked (round-12): the
    // StreamHarness forces one micro-batch per fixture file, so the
    // watermark trajectory is a pure function of the fixture; the oracle
    // REPLAYS the event-time rules (late row dropped once its window end
    // fell behind the batch's watermark; append emission once the final
    // watermark passes a window's end). Fixture margins are wide enough
    // that <= / < boundary conventions and the trailing no-data batch
    // cannot change the output (LateDataSpec pins the trajectory).
    "e_late_data" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatches(s, lateDataBatches,
        df => graft.streaming.EventStream.windowedCounts(df, "1 hour"))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Streaming dedup state lifecycle, driver-checked (round-12): a
    // duplicate fingerprint arriving while the first's state is alive is
    // dropped; once the watermark passes (first ts + delay) the state is
    // evicted and the fingerprint re-admits. The oracle replays the
    // per-batch state chain (alive iff ts + delay > batch watermark).
    "e_watermark_dedup" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatches(s, watermarkDedupBatches,
        df => graft.streaming.EventStream.streamingDedup(df, col("event_type")))
        .select(col("event_id"), col("fingerprint"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy(col("event_id"))
    }),

    // Arbitrary keyed state through a REAL stream (round-13, the r12
    // verdict's remaining streaming primitive): flatMapGroupsWithState
    // gap sessionization with event-time timeout, driven batch-by-batch
    // by StreamHarness. One session closes by supersession, two by
    // watermark-driven state timeout (the fixture comment documents the
    // trajectory); emission CONTENT is batch-invariant, so the oracle is
    // plain LAG-gap sessionization over the same rows.
    "e_stateful_session" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatches(s, statefulSessionBatches,
        df => graft.streaming.EventStream.gapSessions(df, gapMinutes = 30))
        .filter(col("user_id") < 99)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // The gapSessions contract on the transformWithState runtime
    // (round-13): Spark 4.x StatefulProcessor — typed ValueState,
    // EXPLICIT event-time timers, RocksDB state store (required by the
    // API; passed as a harness conf overlay scoped to the stream's
    // isolated session). Same fixture, same trajectory (one supersession
    // close, two timer fires), same LAG-gap batch-twin oracle — the two
    // state APIs must agree row-for-row.
    "e_tws_session" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatches(s, statefulSessionBatches,
        df => graft.streaming.EventStream.gapSessionsTws(df, gapMinutes = 30),
        conf = Map("spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
        .filter(col("user_id") < 99)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Stream-STREAM watermarked inner join through a REAL two-source
    // stream (round-13): views x purchases within 15 min per user, both
    // sides watermarked, driven step-by-step by StreamHarness's
    // two-source variant. Cross-batch state retention on BOTH sides is
    // exercised (V3 joins an earlier purchase, P12 an earlier view), and
    // the step-4 late pair — whose batch twin WOULD match — must emit
    // nothing once the sentinel advanced the watermark past every
    // eviction reading. The oracle replays the event-time rules: per-step
    // global watermark = min(both sides' max ts so far) − 10 min,
    // admitted rows only, then the plain interval join.
    "e_stream_join" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatchesTwo(s, streamJoinBatches,
        (l, r) => graft.streaming.EventStream.intervalJoin(l, r, within = "15 minutes"))
        .filter(col("user_id") < 90)
        .select(col("user_id"), col("l_id"), col("r_id"),
          date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_str"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_str"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    }),

    // Stream-STREAM watermarked LEFT OUTER join (round-14): the one
    // watermarked join mode the inner fixture leaves unexercised —
    // null-side emission forced by watermark advance. V2 (u2) never
    // matches a purchase; once the double sentinel drives the global
    // watermark past V2's window end, Spark PROVES no future match and
    // emits (V2, null-right) from state eviction. The step-5 late pair
    // is dropped on input, so V9 must produce neither a pair nor a
    // phantom null row. The oracle replays admission per step, the
    // interval match over admitted rows, and the null-row rule: an
    // admitted-but-unmatched left row emits iff final_wm > l_ts + 15 min
    // (rows still in live state at stop never ship).
    "e_stream_join_outer" -> ((s, dir) => {
      graft.streaming.StreamHarness.runBatchesTwo(s, streamJoinOuterBatches,
        (l, r) => graft.streaming.EventStream.intervalJoin(
          l, r, within = "15 minutes", joinType = "left_outer"))
        .filter(col("user_id") < 90)
        .select(col("user_id"), col("l_id"), col("r_id"),
          date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_str"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_str"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    }),

    // Streaming-shaped tumbling-window aggregation (batch equivalence; the
    // Structured Streaming path is exercised in the test suite).
    // Stream-stream interval join, batch twin (view -> purchase
    // attribution within 15 minutes per user). The IDENTICAL plan runs as
    // a watermarked stream-stream join in StreamingSpec; here the driver
    // checks it against a plain SQL interval join.
    "e_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.streaming.EventStream.intervalJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        within = "15 minutes")
        .select(col("user_id"), col("l_id"), col("r_id"),
          date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_str"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_str"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    }),

    // Incremental aggregate maintenance: per-user state built from two
    // disjoint batches and MERGED — decimal-exact partials make the
    // merged state bit-identical to the oracle's full recompute.
    "e_incremental_rollup" -> ((s, dir) => {
      import graft.operators.Incremental
      val ev = t(s, dir, "events")
      val s1 = Incremental.aggState(
        ev.filter(col("event_id") % 2 === 0), col("user_id"), col("value"))
      val s2 = Incremental.aggState(
        ev.filter(col("event_id") % 2 === 1), col("user_id"), col("value"))
      Incremental.stateMetrics(Incremental.mergeStates(Seq(s1, s2)))
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"))
    }),

    // Hourly active users (round-9): exact distinct-user counts per hour
    // — the basic engagement series (the KMV sketch family covers the
    // approximate path; this is the exact one).
    "e_hourly_active_users" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hr"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("hr"))
    }),

    // EXACT trailing 24 h active users per hour (round-10): the rolling-
    // DAU monitor — events collapse to distinct (user, hour) FIRST, only
    // that pre-aggregate fans out to the 24 windows each pair affects,
    // then one distinct count per window end. No sketch.
    "e_rolling_active_users" -> ((s, dir) => {
      graft.operators.TimeSeries.rollingActiveUsers(
        t(s, dir, "events"), col("user_id"), col("ts"),
        widthSeconds = 3600L, windowBuckets = 24)
    }),

    // Hourly error rate with Wilson bounds (round-9): rateWithWilson
    // keyed by the hour string — the small-sample-honest SLO readout
    // (3 errors of 7 events is not a 43% error rate you can act on).
    "e_error_rate_wilson" -> ((s, dir) => {
      graft.operators.DataQuality.rateWithWilson(
        t(s, dir, "events").filter(col("ts").isNotNull)
          .select(date_format(col("ts"), "yyyy-MM-dd HH").as("hr"),
            (col("event_type") === "error").as("ok")),
        col("hr"), col("ok"))
    }),

    // Sliding-window counts (round-9): 2h windows sliding hourly — each
    // event lands in exactly two panes; the overlapping-window streaming
    // semantic the tumbling family can't express.
    "e_sliding_window" -> ((s, dir) => {
      graft.streaming.EventStream.slidingCounts(
        t(s, dir, "events").filter(col("ts").isNotNull),
        windowLength = "2 hours", slide = "1 hour")
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Per-type hourly EWMA baseline (round-10): exact-cents bucket
    // means + a fixed-order sequential fold per key (α=0.3) — the
    // anomaly-monitor expectation; the oracle replays the identical op
    // sequence through a recursive CTE.
    "e_ewma_baseline" -> ((s, dir) => {
      graft.operators.TimeSeries.ewmaBaseline(
        t(s, dir, "events"), col("event_type"), col("ts"), col("value"),
        widthSeconds = 3600L, alphaPct = 30)
    }),

    // Windowed heavy hitters (round-10): per-hour top-3 event types by
    // exact count with dense ranks — the trending-items monitor. Stage 1
    // (the per-window counts) is the watermarkable streaming
    // aggregation; the rank cut partitions BY WINDOW (parallel across
    // windows, |categories|-bounded per partition).
    "e_windowed_topk" -> ((s, dir) => {
      graft.streaming.EventStream.windowedTopK(
        t(s, dir, "events").filter(col("ts").isNotNull),
        col("event_type"), windowLength = "1 hour", k = 3)
    }),

    // Windowed Wasserstein drift (round-9): per-hour earth-mover distance
    // of the value distribution vs the GLOBAL distribution — the exact-
    // arithmetic sibling of the pinned PSI monitor; live-oracle-able
    // because every number is BIGINT until two trailing IEEE ops.
    "e_windowed_wdrift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ref = ev.filter(col("value").isNotNull)
        .select(least(lit(9), greatest(lit(0),
          floor((col("value").cast("double") - lit(0L)) * lit(10) / lit(1000.0))
            .cast("int"))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("ref_n"))
      graft.streaming.EventStream.windowedWassersteinDrift(
        ev, col("value"), ref, lo = 0L, hi = 1000L, buckets = 10, "1 hour")
    }),

    // Per-type OLS trend slopes (round-9): centi-value drift per minute,
    // group-centered minute x so every moment stays int64-exact.
    "e_trend_slopes" -> ((s, dir) => {
      graft.operators.DataQuality.groupTrend(
        t(s, dir, "events"), col("event_type"), col("ts"),
        floor(col("value") * 100))
        .withColumnRenamed("group", "event_type")
    }),

    // User growth curve (round-9): new + cumulative distinct users per
    // day — one champion-min debut aggregation, never a windowed
    // count-distinct; the running sum windows the day summary only.
    "e_user_growth" -> ((s, dir) => {
      graft.operators.TimeSeries.userGrowth(
        t(s, dir, "events"), col("user_id"), col("ts"), unit = "day")
    }),

    // Fan-out-guarded join (round-9): the join-explosion tripwire — the
    // per-user dim is provably unique, so the guard passes and the
    // result equals the plain join (which is exactly what the oracle
    // checks); the violated case is spec'd (raise with the offending
    // key), since an oracle can't assert an exception.
    "e_cdc_apply" -> ((s, dir) => {
      import graft.operators.Incremental
      val ev = t(s, dir, "events")
      val snap = ev.filter(col("event_id") % 3 === 0)
        .select(expr("event_id div 3").as("k"), col("value"),
          col("event_type").as("etype"))
      val ch = ev.filter(col("event_id") % 3 =!= 0)
        .select(expr("event_id div 3").as("k"), col("event_id").as("ver"),
          when(col("event_type") === "error", "D")
            .when(col("event_id") % 3 === 1, "U").otherwise("I").as("op"),
          col("value"), col("event_type").as("etype"))
      Incremental.applyChangelog(snap, ch, col("k"), col("ver"), col("op"),
        Seq("value", "etype"))
    }),

    // Left-outer interval join: views with NO conversion in-window emit
    // null-padded (the abandonment signal); streaming emits them only
    // once the watermark proves absence (StreamingSpec).
    "e_interval_join_outer" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.streaming.EventStream.intervalJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        within = "15 minutes", joinType = "left_outer")
        .select(col("user_id"), col("l_id"), col("r_id"),
          date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_str"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_str"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    }),

    // SCD2 versioned merge over a deterministic change batch: inserts,
    // effective upserts (close + reopen), no-op upserts, deletes, and
    // untouched closed history all exercised in one run.
    "e_stream_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_str"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour_str"), col("event_type"))
    }),

    // Windowed drift monitor: hourly event-type mix PSI'd against the
    // global reference distribution — the vocabularyDrift fold per
    // tumbling window, psi per window in BIGINT nanos. Stage 1 (the
    // per-window counts) is the watermarkable streaming aggregation.
    "e_windowed_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ref = ev
        .groupBy(col("event_type").cast("string").as("category"))
        .agg(count(lit(1)).as("ref_n"))
      graft.streaming.EventStream.windowedDrift(
        ev, col("event_type"), ref, windowLength = "1 hour")
    }),

    // Streaming-family twin on an inline fixture (same tumbling-window agg,
    // SF-independent verification — see w3_top_rank_fx rationale).
    // Interval-join twin on an inline fixture (drives the real
    // EventStream.intervalJoin; SF-independent verification so the
    // operator keeps a green row even if the events table regenerates
    // incompatibly — the round-5 lesson).
    "e_interval_join_fx" -> ((s, _) => {
      import s.implicits._
      def ev(rows: Seq[(Long, String, Long)]) =
        rows.toDF("event_id", "ts_str", "user_id")
          .select(col("event_id"), to_timestamp(col("ts_str")).as("ts"),
            col("user_id"), lit(0.0).as("value"))
      val views = ev(Seq(
        (1L, "2025-01-01 00:00:00", 1L),
        (2L, "2025-01-01 00:00:00", 2L),
        (3L, "2025-01-01 00:00:00", 3L)))
      val buys = ev(Seq(
        (11L, "2025-01-01 00:05:00", 1L),
        (12L, "2025-01-01 00:14:00", 1L),
        (13L, "2025-01-01 00:20:00", 2L), // 5 min past the window
        (14L, "2025-01-01 00:15:00", 3L))) // inclusive boundary
      graft.streaming.EventStream.intervalJoin(views, buys, within = "15 minutes")
        .select(col("user_id"), col("l_id"), col("r_id"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    }),

        // Batch twin of EventStream.streamingDedup's state semantics: one
    // survivor per content fingerprint, min event_id standing in for the
    // stream's first arrival (dropDuplicatesWithinWatermark itself
    // requires a stream — the live path is driven in StreamingSpec).
    "e_stream_dedup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(md5(concat(col("user_id").cast("string"), lit(":"),
          coalesce(col("event_type"), lit("")))).as("fingerprint"))
        .agg(min(col("event_id")).as("event_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("event_id"))
    }),

"e_stream_window_fx" -> ((s, _) => {
      import s.implicits._
      Seq(
        ("2025-01-01 00:05:00", "click", 1.25),
        ("2025-01-01 00:40:00", "click", 2.50),
        ("2025-01-01 00:55:00", "view", 0.75),
        ("2025-01-01 01:10:00", "click", 3.25),
        ("2025-01-01 01:59:59", "error", 1.00),
        ("2025-01-01 02:00:00", "view", 4.50),
      ).toDF("ts_str", "event_type", "value")
        .withColumn("ts", to_timestamp(col("ts_str")))
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_str"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour_str"), col("event_type"))
    }),

    // Gap-session twin on an inline fixture, driving the real
    // EventStream.sessionWindows operator (not a reimplementation).
    "e_session_window_fx" -> ((s, _) => {
      import s.implicits._
      val ev = Seq(
        (1L, "2025-01-01 00:00:00", 1.25),
        (1L, "2025-01-01 00:10:00", 2.50),
        (1L, "2025-01-01 01:00:00", 0.75),
        (2L, "2025-01-01 00:05:00", 4.00),
      ).toDF("user_id", "ts_str", "value")
        .withColumn("ts", to_timestamp(col("ts_str")))
        .select(col("ts"), col("user_id"), col("value"))
      graft.streaming.EventStream.sessionWindows(ev, gap = "30 minutes",
        aggs = Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
        .select(
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // §2.7 gap-based session windows (the built-in session_window keyed
    // state; same plan streams with the 10-min watermark — StreamingSpec).
    "e_session_window" -> ((s, dir) => {
      graft.streaming.EventStream.sessionWindows(
        t(s, dir, "events").select(col("ts"), col("user_id"), col("value")),
        gap = "30 minutes",
        aggs = Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
        .select(
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // P11 — coalesce fallback chain (PSM rt -> spectrum rt -> NaN analogue).
    "e_stateful_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .mapGroups { (user, rows) =>
          var n = 0L; var cents = 0L
          rows.foreach { case (_, v) => n += 1; cents += math.round(v * 100) }
          (user, n, cents)
        }
        .toDF("user_id", "n", "total_cents")
        .orderBy(col("user_id"))
    }),

    // §2.6 string-function family: substring, concat, contains,
    // starts_with, translate, upper/lower, capitalize emulation, printf.
    "e_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    // F13 — scan-id validity: integral unless WIFF-style native id.
    "e_seasonal_baseline" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull &&
          col("ts").isNotNull)
        .withColumn("season",
          concat_ws(":", col("event_type"), hour(col("ts")).cast("string")))
      graft.operators.Preference.groupAdvantage(
        ev, col("season"), col("event_id"), floor(col("value") * 100))
        .withColumnRenamed("group_id", "season")
        .withColumnRenamed("id", "event_id")
    }),

    // Composite corpus-construction pipeline over the documents table:
    // quality gate -> langid -> exact dedup -> MinHash near-dup components
    // -> representatives. The CorpusResult unpersist handle is dropped by
    // design here: the driver contract needs a lazy DataFrame, and
    // repeated invocations share ONE cache entry (CacheManager keys on the
    // canonical plan), so memory is bounded; long-lived library callers
    // use the handle.
    // REAL PCM16LE framing (round-13, the audio lane's decode proof):
    // the fixture waveform packed as ACTUAL little-endian int16 bytes,
    // decoded byte-by-byte by the engine and framed into 256-sample
    // windows with exact-integer stats (L1 energy, zero crossings,
    // peaks); the oracle re-derives every sample from the formula — an
    // endianness/sign-extension slip anywhere in the byte path goes red.
    "mm_audio_frames" -> ((s, dir) => {
      graft.operators.Multimodal.pcm16Frames(syntheticAudioRows(s, dir, 40), frameSize = 256)
        .toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Energy-gated VAD spans (round-13): the silence-trim composition —
    // 128-sample frames through the real byte decode, mean-energy gate
    // at 1000 (exact integer predicate, no division), contiguous kept
    // frames merged into spans (the fixture yields 4 islands per id,
    // including a 2-frame run). Oracle replays gate + LAG islands over
    // the formula waveform.
    "mm_audio_vad" -> ((s, dir) => {
      graft.operators.Multimodal.vadSpans(
        graft.operators.Multimodal.pcm16Frames(
          syntheticAudioRows(s, dir, 40), frameSize = 128),
        meanThreshold = 1000L)
    }),

    // REAL RIFF/WAVE container parse (round-14): actual WAV files —
    // RIFF preamble, fmt chunk, a junk LIST chunk a non-walking parser
    // trips over, data chunk — with rate/channels/frame-count/duration
    // read from the HEADER BYTES; headerless raw-PCM rows coexist and
    // take the fallback reading. The oracle re-derives every field from
    // the fixture formulas, so a single mis-read header byte goes red.
    "mm_wav_meta" -> ((s, dir) => {
      graft.operators.Multimodal.wavMeta(syntheticWavRows(s, dir, 40))
        .toDF()
        .orderBy(col("media_id"))
    }),

    // PCM framing THROUGH the container (round-14): channel 0
    // deinterleaved from the data chunk at the fmt block-align stride,
    // from the header-declared offset — the byte path a bare-PCM reader
    // cannot fake (stereo rows would shift one sample off and every
    // stat goes red). Raw rows take the fallback whole-payload reading.
    "mm_wav_frames" -> ((s, dir) => {
      graft.operators.Multimodal.wavPcmFrames(syntheticWavRows(s, dir, 40), frameSize = 200)
        .toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // REAL AVI container index walk (round-14, retiring the video
    // lane's stub as the only demux): actual RIFF `AVI ` files — avih
    // header, JUNK padding, movi frame chunks, idx1 index with BOTH
    // offset conventions (movi-relative on even ids, absolute on odd)
    // — and every frame's true bytes fingerprinted from the resolved
    // offsets. A parser that lands one byte off md5-mismatches.
    "mm_avi_index" -> ((s, dir) => {
      graft.operators.Multimodal.aviIndex(syntheticAviRows(s, dir, 40))
        .toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // REAL frame sampling through the container (round-14): samples
    // every 100 ms of avih-declared duration, each snapped back to the
    // nearest preceding idx1 KEYFRAME (how a player seeks) and shipping
    // that frame's real bytes; unparseable payloads keep the honest
    // stub fallback — both paths in one corpus, one oracle.
    "mm_real_frames" -> ((s, dir) => {
      graft.operators.Multimodal.sampleFramesAvi(
        syntheticAviRows(s, dir, 40), everyMs = 100L, fallbackFrameBytes = 24)
        .toDF()
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("ts_ms"), col("n_bytes").cast("long").as("n_bytes"),
          md5(hex(col("payload"))).as("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // TIME-based VAD spans (round-14): the vadSpans islands lifted into
    // exact-integer milliseconds via the container's sample rate —
    // floor-div ms bounds replayed verbatim by the oracle. Only parsed
    // containers carry a rate, so raw rows drop out by contract.
    "mm_wav_vad_ms" -> ((s, dir) => {
      val fx = syntheticWavRows(s, dir, 40)
      graft.operators.Multimodal.vadSpansMs(
        graft.operators.Multimodal.wavPcmFrames(fx, frameSize = 100),
        graft.operators.Multimodal.wavMeta(fx),
        frameSize = 100, meanThreshold = 1000L)
    }),

    // REAL decode metadata (round-12): the PNG fixtures through the
    // genuine ImageIO raster decode — dimensions and the md5 of the
    // decoded gray8 buffer, which the oracle re-derives pixel-for-pixel
    // from the fixture formula (PNG is lossless). The most direct proof
    // the codec path is real: any decode deviation breaks the hash.
    "mm_decode_meta" -> ((s, dir) => {
      graft.operators.Multimodal.decodeImages(syntheticImageRows(s, dir, 40))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          octet_length(col("pixels")).cast("long").as("n_pixels"),
          md5(hex(col("pixels"))).as("pixel_md5"))
        .orderBy(col("media_id"))
    }),

    // Feature extraction over REALLY-DECODED rasters (round-12): even
    // doc_ids ship PNG fixtures (decoded=true, 8 block means over the
    // gray pixels), odd doc_ids ship raw text bytes as "audio"
    // (decoded=false, same block means over the opaque bytes — the honest
    // generic fallback). Exact integer block sums, one IEEE division per
    // block -> fully LIVE oracle (this query was a VALUES pin when the
    // decode was stubbed).
    "mm_feature_extract" -> ((s, dir) => {
      import s.implicits._
      val mm = graft.operators.Multimodal
      val images = syntheticImageRows(s, dir, 50).filter(_.media_id % 2 == 0)
      val audio = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 50 && col("doc_id") % 2 === 1)
        .as[(Long, String)]
        .map { case (id, text) =>
          mm.MediaRow(id, "audio", text.getBytes("UTF-8"), None, None, None)
        }
      mm.extractFeatures(images.union(audio), dim = 8)
        .toDF()
        .select(col("media_id"), col("media_type"), col("decoded"),
          col("width"), col("height"), col("n_values").cast("long").as("n_values"),
          posexplode(col("feature")).as(Seq("pos", "feature")))
        .select(col("media_id"), col("media_type"), col("decoded"),
          col("width"), col("height"), col("n_values"),
          col("pos").cast("long").as("pos"), col("feature"))
        .orderBy(col("media_id"), col("pos"))
    }),

    // REAL resize (round-12): PNG fixtures through the genuine decode,
    // then a 2D nearest-neighbor resample of the TRUE raster to 8x8 —
    // out(dy,dx) = in((dy*h) div 8, (dx*w) div 8); the oracle re-derives
    // every output byte from the fixture formula. The comparison key is
    // md5 over the UPPERCASE hex string — both engines' hex() emit
    // uppercase, and neither can md5 a BLOB directly.
    "mm_resize" -> ((s, dir) => {
      graft.operators.Multimodal.resizeImages(
        syntheticImageRows(s, dir, 40), dstW = 8, dstH = 8)
        .toDF()
        .select(col("media_id"), col("width"), col("height"), col("n_bytes"),
          md5(hex(col("payload"))).as("payload_md5"))
        .orderBy(col("media_id"))
    }),

    // Multimodal frame sampling: one row per sampled frame (every 100 ms
    // of the stub duration = 1 ms/byte), frame bytes re-derived by the
    // oracle as hex-string slices. Linear fan-out, no shuffle.
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val b = text.getBytes("UTF-8")
          graft.operators.Multimodal.MediaRow(
            id, "video", b, None, None, Some(b.length.toLong))
        }
      graft.operators.Multimodal.sampleFrames(media, everyMs = 100L, frameBytes = 24)
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("ts_ms"), col("n_bytes"),
          md5(hex(col("payload"))).as("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // Event-time rule replay: per batch k the watermark is max(ts through
    // batch k-1) - 10 min; a row whose 1h-window END fell behind it is
    // dropped; a window ships iff its end passed the FINAL watermark
    // (max over all ts - 10 min). The double-sentinel fixture makes both
    // <=/< boundary readings identical (LateDataSpec pins the run).
    "e_late_data" ->
      s"""WITH ev(batch, event_id, ts, event_type, value) AS (
         |  SELECT * FROM (VALUES ${fxValues(lateDataBatches)})),
         |wm AS (
         |  SELECT e.batch, max(p.ts) - INTERVAL 10 MINUTE AS wm
         |  FROM ev e LEFT JOIN ev p ON p.batch < e.batch
         |  GROUP BY e.batch),
         |kept AS (
         |  SELECT e.* FROM ev e JOIN wm ON wm.batch = e.batch
         |  WHERE wm.wm IS NULL OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.wm),
         |fwm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS f FROM ev),
         |agg AS (
         |  SELECT date_trunc('hour', ts) AS ws, event_type,
         |    count(*)::BIGINT AS n, sum(value) AS sum_value
         |  FROM kept GROUP BY 1, 2)
         |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, n, sum_value
         |FROM agg CROSS JOIN fwm WHERE ws + INTERVAL 1 HOUR <= f
         |ORDER BY window_start, event_type""".stripMargin,

    // Dedup state-lifecycle replay: batch 1 all admits; a later row drops
    // iff some ADMITTED earlier-batch row shares its fingerprint and that
    // row's state is still alive (state ts + 10 min > the batch's
    // watermark). Fixture margins make state-refresh-on-duplicate
    // indistinguishable from create-only.
    "e_watermark_dedup" ->
      s"""WITH ev(batch, event_id, ts, event_type, value) AS (
         |  SELECT * FROM (VALUES ${fxValues(watermarkDedupBatches)})),
         |k1 AS (SELECT * FROM ev WHERE batch = 1),
         |wm2 AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM ev WHERE batch <= 1),
         |k2 AS (
         |  SELECT e.* FROM ev e CROSS JOIN wm2
         |  WHERE e.batch = 2 AND NOT EXISTS (
         |    SELECT 1 FROM k1 s
         |    WHERE s.event_type = e.event_type AND s.ts + INTERVAL 10 MINUTE > wm2.wm)),
         |wm3 AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM ev WHERE batch <= 2),
         |k3 AS (
         |  SELECT e.* FROM ev e CROSS JOIN wm3
         |  WHERE e.batch = 3 AND NOT EXISTS (
         |    SELECT 1 FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2) s
         |    WHERE s.event_type = e.event_type AND s.ts + INTERVAL 10 MINUTE > wm3.wm))
         |SELECT event_id, event_type AS fingerprint,
         |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
         |FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2 UNION ALL SELECT * FROM k3)
         |ORDER BY event_id""".stripMargin,

    // transformWithState twin: the e_stateful_session oracle verbatim —
    // the two state APIs implement ONE contract, so one LAG-gap
    // re-derivation gates both (divergence between the runtimes shows up
    // as exactly one of the two rows going red).
    "e_tws_session" ->
      s"""WITH ev(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(statefulSessionBatches)})),
         |o AS (
         |  SELECT user_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
         |  FROM ev WHERE user_id < 99),
         |f AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE
         |      THEN 1 ELSE 0 END AS brk
         |  FROM o),
         |g AS (
         |  SELECT user_id, ts, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM f)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |  count(*)::BIGINT AS n, sum(value) AS sum_value
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    // Stream-stream join replay: per step, each SOURCE's watermark input
    // is max ts seen through the PRIOR steps, defaulting to the EPOCH for
    // a source that has emitted nothing yet — exactly Spark's per-source
    // default (a no-data source contributes watermark 0, not "skip me"),
    // so the oracle stays valid for the one-sided-arrival steps
    // runBatchesTwo supports; global watermark = least of the two − 10
    // min. A row is admitted iff ts >= wm (the fixture's ~10 h margins
    // make every stricter/looser eviction reading identical); then the
    // plain interval join over admitted rows — pairs whose late member
    // was dropped never form.
    "e_stream_join" ->
      s"""WITH lraw(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(streamJoinBatches.map(_._1))})),
         |rraw(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(streamJoinBatches.map(_._2))})),
         |wm AS (
         |  SELECT b.batch,
         |    least(
         |      coalesce((SELECT max(p.ts) FROM lraw p WHERE p.batch < b.batch),
         |               TIMESTAMP '1970-01-01 00:00:00'),
         |      coalesce((SELECT max(p.ts) FROM rraw p WHERE p.batch < b.batch),
         |               TIMESTAMP '1970-01-01 00:00:00'))
         |      - INTERVAL 10 MINUTE AS wm
         |  FROM (SELECT batch FROM lraw UNION SELECT batch FROM rraw) b),
         |la AS (
         |  SELECT l.* FROM lraw l JOIN wm ON wm.batch = l.batch
         |  WHERE l.ts >= wm.wm),
         |ra AS (
         |  SELECT r.* FROM rraw r JOIN wm ON wm.batch = r.batch
         |  WHERE r.ts >= wm.wm)
         |SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
         |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_str,
         |  strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_str
         |FROM la l JOIN ra r ON r.user_id = l.user_id
         |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE
         |WHERE l.user_id < 90
         |ORDER BY l.user_id, l_id, r_id""".stripMargin,

    // Left-outer replay: the inner oracle's admission + interval match,
    // plus the null-row rule — an ADMITTED left row with no admitted
    // match emits (l, NULL) iff the final global watermark passed its
    // window end (eviction proved absence); the fixture's last step adds
    // no newer ts, so final_wm is the same whether or not a trailing
    // no-data micro-batch ran before stop. A late-DROPPED left row (V9)
    // is absent from la entirely, so it can produce neither a pair nor
    // a phantom null row — exactly the engine rule.
    "e_stream_join_outer" ->
      s"""WITH lraw(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(streamJoinOuterBatches.map(_._1))})),
         |rraw(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(streamJoinOuterBatches.map(_._2))})),
         |wm AS (
         |  SELECT b.batch,
         |    least(
         |      coalesce((SELECT max(p.ts) FROM lraw p WHERE p.batch < b.batch),
         |               TIMESTAMP '1970-01-01 00:00:00'),
         |      coalesce((SELECT max(p.ts) FROM rraw p WHERE p.batch < b.batch),
         |               TIMESTAMP '1970-01-01 00:00:00'))
         |      - INTERVAL 10 MINUTE AS wm
         |  FROM (SELECT batch FROM lraw UNION SELECT batch FROM rraw) b),
         |fwm AS (
         |  SELECT least((SELECT max(ts) FROM lraw), (SELECT max(ts) FROM rraw))
         |    - INTERVAL 10 MINUTE AS wm),
         |la AS (
         |  SELECT l.* FROM lraw l JOIN wm ON wm.batch = l.batch
         |  WHERE l.ts >= wm.wm),
         |ra AS (
         |  SELECT r.* FROM rraw r JOIN wm ON wm.batch = r.batch
         |  WHERE r.ts >= wm.wm),
         |m AS (
         |  SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
         |    l.ts AS l_ts, r.ts AS r_ts
         |  FROM la l JOIN ra r ON r.user_id = l.user_id
         |    AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE),
         |nulls AS (
         |  SELECT l.user_id, l.event_id AS l_id, NULL::BIGINT AS r_id,
         |    l.ts AS l_ts, NULL::TIMESTAMP AS r_ts
         |  FROM la l CROSS JOIN fwm
         |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.l_id = l.event_id)
         |    AND l.ts + INTERVAL 15 MINUTE < fwm.wm)
         |SELECT user_id, l_id, r_id,
         |  strftime(l_ts, '%Y-%m-%d %H:%M:%S') AS l_ts_str,
         |  strftime(r_ts, '%Y-%m-%d %H:%M:%S') AS r_ts_str
         |FROM (SELECT * FROM m UNION ALL SELECT * FROM nulls)
         |WHERE user_id < 90
         |ORDER BY user_id, l_id, r_id""".stripMargin,

    // Batch-twin gap sessionization: LAG over ts per user, a break when
    // the gap exceeds 30 min, sessions = groupBy cumulative break count.
    // Valid as the streaming oracle because the engine's emission content
    // is batch-invariant (fixture margins; see statefulSessionBatches).
    "e_stateful_session" ->
      s"""WITH ev(batch, event_id, ts, user_id, value) AS (
         |  SELECT * FROM (VALUES ${fxValuesU(statefulSessionBatches)})),
         |o AS (
         |  SELECT user_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
         |  FROM ev WHERE user_id < 99),
         |f AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE
         |      THEN 1 ELSE 0 END AS brk
         |  FROM o),
         |g AS (
         |  SELECT user_id, ts, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM f)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |  count(*)::BIGINT AS n, sum(value) AS sum_value
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "e_seasonal_baseline" ->
      """WITH b AS (
        |  SELECT event_type || ':' || CAST(hour(ts) AS VARCHAR) AS season, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS reward_fp
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL),
        |g AS (
        |  SELECT season, COUNT(*) AS n, SUM(reward_fp) AS s,
        |         SUM(reward_fp * reward_fp) AS ss
        |  FROM b GROUP BY season),
        |st AS (
        |  SELECT season, n,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    sqrt(greatest(CAST(ss AS DOUBLE) / n
        |         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS std
        |  FROM g)
        |SELECT b.season, b.event_id, b.reward_fp, st.n, st.mean, st.std,
        |  CASE WHEN st.std > 0.0
        |       THEN (CAST(b.reward_fp AS DOUBLE) - st.mean) / st.std
        |       ELSE 0.0 END AS advantage
        |FROM b JOIN st ON st.season = b.season
        |ORDER BY b.season, b.event_id""".stripMargin,

    // Group-advantage re-derivation: exact BIGINT group sums s/ss, every
    // double an int64→double conversion or fixed-association IEEE op in
    // the engine's exact order ((ss/n - mean*mean) guarded to 0, one
    // exactly-rounded sqrt, (r - mean)/std).
    // Gini re-derivation: same histogram, strictly-below prefix, and the
    // tied-group (lo+hi)-range identity; one division at the end.
    "dq_gini" ->
      """WITH h AS (
        |  SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS cnt
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT v, cnt,
        |    coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
        |  FROM h),
        |a AS (
        |  SELECT sum(cnt)::BIGINT AS n, sum(v * cnt)::BIGINT AS sum_x,
        |    sum(v * cnt * (2 * cum + cnt + 1))::BIGINT AS twoix
        |  FROM w)
        |SELECT n, sum_x, (twoix - (n + 1) * sum_x)::BIGINT AS gini_num,
        |  CASE WHEN n > 0 AND sum_x > 0
        |    THEN (twoix - (n + 1) * sum_x)::DOUBLE / (n::DOUBLE * sum_x::DOUBLE)
        |  END AS gini
        |FROM a""".stripMargin,

    // CUSUM re-derivation: identical prefix-sum and running-min windows
    // under the same (ts, event_id) within-key total order.
    "e_cusum_changepoint" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, floor(value * 100)::BIGINT AS v100
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL),
        |p AS (
        |  SELECT event_type, ts, event_id, v100,
        |    sum(v100 - 5200) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
        |  FROM b),
        |m AS (
        |  SELECT event_type, event_id, v100, pf,
        |    min(pf) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
        |  FROM p)
        |SELECT event_type, event_id, v100,
        |  (pf - least(mp, 0))::BIGINT AS cusum,
        |  (pf - least(mp, 0)) > 50000 AS alarm
        |FROM m ORDER BY event_type, event_id""".stripMargin,

    // Mann-Whitney re-derivation: the same tie-grouped histogram, full
    // outer value merge, strictly-below prefix windows, doubled-U integer
    // sums, and the verbatim z association (sqrt over one fixed tree).
    "dq_mann_whitney" ->
      """WITH ev AS (
        |  SELECT user_id, floor(value * 100)::BIGINT AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |va AS (SELECT v, count(*)::BIGINT AS n_a FROM ev WHERE user_id % 2 = 0 GROUP BY v),
        |vb AS (SELECT v, count(*)::BIGINT AS n_b FROM ev WHERE user_id % 2 = 1 GROUP BY v),
        |p AS (
        |  SELECT coalesce(va.v, vb.v) AS v,
        |    coalesce(n_a, 0)::BIGINT AS n_a, coalesce(n_b, 0)::BIGINT AS n_b
        |  FROM va FULL OUTER JOIN vb ON va.v = vb.v),
        |w AS (
        |  SELECT v, n_a, n_b,
        |    coalesce(sum(n_a) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_a,
        |    coalesce(sum(n_b) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_b
        |  FROM p),
        |agg AS (
        |  SELECT sum(n_a)::BIGINT AS n1, sum(n_b)::BIGINT AS n2,
        |    sum(n_a * (2 * cum_b + n_b))::BIGINT AS u1_x2,
        |    sum(n_b * (2 * cum_a + n_a))::BIGINT AS u2_x2,
        |    sum((n_a + n_b) * (n_a + n_b) * (n_a + n_b) - (n_a + n_b))::BIGINT AS tie_sum
        |  FROM w)
        |SELECT n1, n2, u1_x2, u2_x2, tie_sum,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND
        |    sqrt((n1::DOUBLE * n2::DOUBLE / 12.0::DOUBLE) *
        |      (((n1 + n2)::DOUBLE + 1.0::DOUBLE)
        |        - tie_sum::DOUBLE / ((n1 + n2)::DOUBLE * ((n1 + n2)::DOUBLE - 1.0::DOUBLE))))
        |    > 0.0::DOUBLE
        |  THEN (u1_x2::DOUBLE - n1::DOUBLE * n2::DOUBLE) /
        |    (2.0::DOUBLE * sqrt((n1::DOUBLE * n2::DOUBLE / 12.0::DOUBLE) *
        |      (((n1 + n2)::DOUBLE + 1.0::DOUBLE)
        |        - tie_sum::DOUBLE / ((n1 + n2)::DOUBLE * ((n1 + n2)::DOUBLE - 1.0::DOUBLE)))))
        |  END AS z
        |FROM agg""".stripMargin,

    "dq_ks_drift" ->
      """WITH bins AS (SELECT unnest(range(12)) AS bucket),
        |ba AS (
        |  SELECT least(11, greatest(0,
        |      floor((n_chars::DOUBLE - 0) * 12 / 600.0::DOUBLE)::INT)) AS bucket,
        |    count(*)::BIGINT AS n_a
        |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |bb AS (
        |  SELECT least(11, greatest(0,
        |      floor((n_chars::DOUBLE - 0) * 12 / 600.0::DOUBLE)::INT)) AS bucket,
        |    count(*)::BIGINT AS n_b
        |  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT b.bucket, coalesce(ba.n_a, 0)::BIGINT AS n_a,
        |    coalesce(bb.n_b, 0)::BIGINT AS n_b
        |  FROM bins b LEFT JOIN ba ON ba.bucket = b.bucket
        |  LEFT JOIN bb ON bb.bucket = b.bucket),
        |t AS (SELECT sum(n_a)::BIGINT AS t_a, sum(n_b)::BIGINT AS t_b FROM j),
        |cd AS (
        |  SELECT bucket, n_a, n_b,
        |    sum(n_a) OVER (ORDER BY bucket)::BIGINT AS cum_a,
        |    sum(n_b) OVER (ORDER BY bucket)::BIGINT AS cum_b
        |  FROM j),
        |w2 AS (
        |  SELECT cd.bucket, cd.n_a, cd.n_b, cd.cum_a, cd.cum_b,
        |    cum_a::DOUBLE / t.t_a::DOUBLE AS cdf_a,
        |    cum_b::DOUBLE / t.t_b::DOUBLE AS cdf_b,
        |    abs(cum_a::DOUBLE / t.t_a::DOUBLE - cum_b::DOUBLE / t.t_b::DOUBLE) AS d
        |  FROM cd CROSS JOIN t),
        |k AS (SELECT max(d) AS ks FROM w2)
        |SELECT w2.bucket, w2.n_a, w2.n_b, w2.cum_a, w2.cum_b,
        |  w2.cdf_a, w2.cdf_b, w2.d, k.ks
        |FROM w2 CROSS JOIN k ORDER BY bucket""".stripMargin,

    // Benford re-derivation: leading digits from exact integer→string
    // rendering, the reviewed nano-share constants, BIGINT deviations
    // and integer-div total variation — no float anywhere.
    "dq_benford" ->
      """WITH v AS (
        |  SELECT abs(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c AS (
        |  SELECT CAST(substr(v::VARCHAR, 1, 1) AS INTEGER) AS digit,
        |    count(*)::BIGINT AS o
        |  FROM v WHERE v > 0 GROUP BY 1),
        |t AS (SELECT coalesce(sum(o), 0)::BIGINT AS n FROM c),
        |g AS (
        |  SELECT d.digit, coalesce(c.o, 0)::BIGINT AS o,
        |    (CASE d.digit WHEN 1 THEN 301029996 WHEN 2 THEN 176091259
        |      WHEN 3 THEN 124938737 WHEN 4 THEN 96910013 WHEN 5 THEN 79181246
        |      WHEN 6 THEN 66946790 WHEN 7 THEN 57991947 WHEN 8 THEN 51152522
        |      ELSE 45757491 END)::BIGINT AS share_n9, t.n
        |  FROM (SELECT unnest(range(1, 10))::INTEGER AS digit) d
        |  LEFT JOIN c ON c.digit = d.digit CROSS JOIN t),
        |g2 AS (
        |  SELECT digit, o, share_n9,
        |    abs(o * 1000000000 - n * share_n9)::BIGINT AS dev_n9, n
        |  FROM g),
        |tv AS (SELECT (sum(dev_n9) // (2 * n))::BIGINT AS tv_n9 FROM g2 GROUP BY n)
        |SELECT g2.digit, g2.o, g2.share_n9, g2.dev_n9, g2.n, tv.tv_n9
        |FROM g2 CROSS JOIN tv ORDER BY g2.digit""".stripMargin,

    // Wasserstein re-derivation: the dq_ks_drift grid CTEs with the
    // exact-integer |cum_a·t_b − cum_b·t_a| numerators and the two
    // trailing IEEE ops.
    "dq_wasserstein_drift" ->
      """WITH bins AS (SELECT unnest(range(12)) AS bucket),
        |ba AS (
        |  SELECT least(11, greatest(0,
        |      floor((n_chars::DOUBLE - 0) * 12 / 600.0::DOUBLE)::INT)) AS bucket,
        |    count(*)::BIGINT AS n_a
        |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |bb AS (
        |  SELECT least(11, greatest(0,
        |      floor((n_chars::DOUBLE - 0) * 12 / 600.0::DOUBLE)::INT)) AS bucket,
        |    count(*)::BIGINT AS n_b
        |  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT b.bucket, coalesce(ba.n_a, 0)::BIGINT AS n_a,
        |    coalesce(bb.n_b, 0)::BIGINT AS n_b
        |  FROM bins b LEFT JOIN ba ON ba.bucket = b.bucket
        |  LEFT JOIN bb ON bb.bucket = b.bucket),
        |t AS (SELECT sum(n_a)::BIGINT AS t_a, sum(n_b)::BIGINT AS t_b FROM j),
        |cd AS (
        |  SELECT bucket, n_a, n_b,
        |    sum(n_a) OVER (ORDER BY bucket)::BIGINT AS cum_a,
        |    sum(n_b) OVER (ORDER BY bucket)::BIGINT AS cum_b
        |  FROM j),
        |d AS (
        |  SELECT cd.bucket, cd.n_a, cd.n_b, cd.cum_a, cd.cum_b,
        |    abs(cd.cum_a * t.t_b - cd.cum_b * t.t_a)::BIGINT AS diff_num,
        |    t.t_a, t.t_b
        |  FROM cd CROSS JOIN t),
        |w1t AS (
        |  SELECT sum(diff_num)::BIGINT AS w1_num,
        |    sum(diff_num)::DOUBLE / (any_value(t_a) * any_value(t_b))::DOUBLE
        |      * (600.0::DOUBLE / 12) AS w1
        |  FROM d)
        |SELECT d.bucket, d.n_a, d.n_b, d.cum_a, d.cum_b, d.diff_num,
        |  w1t.w1_num, w1t.w1
        |FROM d CROSS JOIN w1t ORDER BY d.bucket""".stripMargin,

    // Chi-square re-derivation: observed cells, marginals, expectation
    // (rt*ct)::DOUBLE/n, contributions and closed-form terms rounded to
    // 9 dp and decimal-summed; level counts from the marginal frames so
    // a NULL level still counts toward dof.
    "dq_chi_square" -> PinnedOracles.sql("dq_chi_square"),

    // PPS sample: same md5-uniform, inclusion probability
    // least(1, (target * size) / total) in the engine's literal-first
    // association, HT weight = 1/p.
    "e_downsample_ohlc" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket, ts, event_id, value
        |  FROM events WHERE ts IS NOT NULL),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT event_type, bucket,
        |  make_timestamp(bucket * 3600000000) AS bucket_start,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  max(value) AS high, min(value) AS low, count(*)::BIGINT AS volume
        |FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin,

    // Gap stats: lag over epoch micros per user (ties lag equal values —
    // the gap multiset is order-invariant), exact integer sums divided
    // once; a / b / c left-association matches the engine.
    "e_gap_stats" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
        |      AS gap_us
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(CASE WHEN gap_us > 60000000 THEN 1 ELSE 0 END)::BIGINT AS n_gaps,
        |  max(gap_us)::DOUBLE / '1000000.0'::DOUBLE AS max_gap_s,
        |  sum(gap_us)::DOUBLE / count(gap_us)::DOUBLE / '1000000.0'::DOUBLE AS mean_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // JS vocab drift: union vocab cut, per-side Laplace shares as exact
    // rationals, contribution association 0.5*(p*ln(p/m)) + 0.5*(q*ln(q/m))
    // mirrored term for term, decimal-summed.
    "e_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(ts) AS t0 FROM e WHERE event_type = 'view'
        |       GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t1 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t0 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t1 GROUP BY e.user_id)
        |SELECT s1.user_id,
        |  (1 + CASE WHEN s2.t1 IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN s3.t2 IS NOT NULL THEN 1 ELSE 0 END)::INT AS stages_completed,
        |  s1.t0 AS first_at, coalesce(s3.t2, s2.t1, s1.t0) AS completed_at
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Cohort retention: same exact floor-division week bucketing,
    // first-seen join, distinct count per (cohort, offset).
    "e_cohort_retention" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS b FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |f AS (SELECT user_id, min(b) AS cohort FROM b GROUP BY user_id)
        |SELECT f.cohort, b.b - f.cohort AS "offset",
        |  count(DISTINCT b.user_id)::BIGINT AS n_users
        |FROM b JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // RRF fusion: BM25 ranking re-derived as in txt_bm25_topk (rank =
    // row_number over its deterministic cut), cosine ranking re-derived
    // as in sim_topk_bruteforce for query 3, then
    // 1/(60+ra) + 1/(60+rb) in the engine's association.
    "dq_profile" ->
      """WITH a AS (SELECT count(*)::BIGINT AS n,
        |  sum((doc_id IS NULL)::INT)::BIGINT AS nu1, count(DISTINCT doc_id)::BIGINT AS nd1,
        |    min(doc_id)::VARCHAR AS mn1, max(doc_id)::VARCHAR AS mx1,
        |  sum((text IS NULL)::INT)::BIGINT AS nu2, count(DISTINCT text)::BIGINT AS nd2,
        |    min(text)::VARCHAR AS mn2, max(text)::VARCHAR AS mx2,
        |  sum((lang IS NULL)::INT)::BIGINT AS nu3, count(DISTINCT lang)::BIGINT AS nd3,
        |    min(lang)::VARCHAR AS mn3, max(lang)::VARCHAR AS mx3,
        |  sum((source IS NULL)::INT)::BIGINT AS nu4, count(DISTINCT source)::BIGINT AS nd4,
        |    min(source)::VARCHAR AS mn4, max(source)::VARCHAR AS mx4,
        |  sum((n_chars IS NULL)::INT)::BIGINT AS nu5, count(DISTINCT n_chars)::BIGINT AS nd5,
        |    min(n_chars)::VARCHAR AS mn5, max(n_chars)::VARCHAR AS mx5
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'doc_id' AS "column", 'bigint' AS dtype, n AS n_rows, nu1 AS n_nulls,
        |    nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM a
        |  UNION ALL SELECT 'text', 'string', n, nu2, nd2, mn2, mx2 FROM a
        |  UNION ALL SELECT 'lang', 'string', n, nu3, nd3, mn3, mx3 FROM a
        |  UNION ALL SELECT 'source', 'string', n, nu4, nd4, mn4, mx4 FROM a
        |  UNION ALL SELECT 'n_chars', 'bigint', n, nu5, nd5, mn5, mx5 FROM a)
        |ORDER BY "column"""".stripMargin,

    // Schema-drift re-derivation: one stats CTE per snapshot (the
    // dq_profile shape minus min/max), per-column rows via UNION ALL,
    // full-outer on column name, exact ppm integer divisions.
    "dq_schema_drift" ->
      """WITH da AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        |db AS (SELECT doc_id, text,
        |    CASE WHEN doc_id % 10 = 1 THEN NULL ELSE lang END AS lang, source,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents WHERE doc_id % 2 = 1),
        |sa AS (SELECT count(*)::BIGINT AS n,
        |  sum((doc_id IS NULL)::INT)::BIGINT AS nu1, count(DISTINCT doc_id)::BIGINT AS nd1,
        |  sum((text IS NULL)::INT)::BIGINT AS nu2, count(DISTINCT text)::BIGINT AS nd2,
        |  sum((lang IS NULL)::INT)::BIGINT AS nu3, count(DISTINCT lang)::BIGINT AS nd3,
        |  sum((source IS NULL)::INT)::BIGINT AS nu4, count(DISTINCT source)::BIGINT AS nd4,
        |  sum((n_chars IS NULL)::INT)::BIGINT AS nu5, count(DISTINCT n_chars)::BIGINT AS nd5
        |  FROM da),
        |sb AS (SELECT count(*)::BIGINT AS n,
        |  sum((doc_id IS NULL)::INT)::BIGINT AS nu1, count(DISTINCT doc_id)::BIGINT AS nd1,
        |  sum((text IS NULL)::INT)::BIGINT AS nu2, count(DISTINCT text)::BIGINT AS nd2,
        |  sum((lang IS NULL)::INT)::BIGINT AS nu3, count(DISTINCT lang)::BIGINT AS nd3,
        |  sum((source IS NULL)::INT)::BIGINT AS nu4, count(DISTINCT source)::BIGINT AS nd4,
        |  sum((n_tokens IS NULL)::INT)::BIGINT AS nu5, count(DISTINCT n_tokens)::BIGINT AS nd5
        |  FROM db),
        |pa AS (
        |  SELECT 'doc_id' AS col, 'bigint' AS dtype_a, n AS n_rows_a,
        |    nu1 AS nulls_a, nd1 AS n_distinct_a FROM sa
        |  UNION ALL SELECT 'text', 'string', n, nu2, nd2 FROM sa
        |  UNION ALL SELECT 'lang', 'string', n, nu3, nd3 FROM sa
        |  UNION ALL SELECT 'source', 'string', n, nu4, nd4 FROM sa
        |  UNION ALL SELECT 'n_chars', 'bigint', n, nu5, nd5 FROM sa),
        |pb AS (
        |  SELECT 'doc_id' AS col, 'bigint' AS dtype_b, n AS n_rows_b,
        |    nu1 AS nulls_b, nd1 AS n_distinct_b FROM sb
        |  UNION ALL SELECT 'text', 'string', n, nu2, nd2 FROM sb
        |  UNION ALL SELECT 'lang', 'string', n, nu3, nd3 FROM sb
        |  UNION ALL SELECT 'source', 'string', n, nu4, nd4 FROM sb
        |  UNION ALL SELECT 'n_tokens', 'bigint', n, nu5, nd5 FROM sb)
        |SELECT coalesce(pa.col, pb.col) AS "column",
        |  pa.dtype_a, pb.dtype_b,
        |  (pa.dtype_a IS DISTINCT FROM pb.dtype_b) AS type_changed,
        |  pa.n_rows_a, pb.n_rows_b,
        |  (pa.nulls_a * 1000000) // pa.n_rows_a AS null_ppm_a,
        |  (pb.nulls_b * 1000000) // pb.n_rows_b AS null_ppm_b,
        |  (coalesce((pb.nulls_b * 1000000) // pb.n_rows_b, 0)
        |    - coalesce((pa.nulls_a * 1000000) // pa.n_rows_a, 0)) AS null_ppm_delta,
        |  pa.n_distinct_a, pb.n_distinct_b
        |FROM pa FULL OUTER JOIN pb ON pb.col = pa.col
        |ORDER BY "column"""".stripMargin,

    // Confusion matrix: the txt_langid prediction CTE + cell counts with
    // a per-actual window total (the oracle's rendering of the engine's
    // broadcast marginal join — same single division).
    "dq_langid_confusion" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','una'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','和','有'))) AS h_zh
        |  FROM tk),
        |b AS (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS hm FROM h),
        |pr AS (
        |  SELECT lang AS actual,
        |    CASE WHEN hm <= 0 THEN 'und'
        |         WHEN h_de = hm THEN 'de' WHEN h_en = hm THEN 'en' WHEN h_es = hm THEN 'es'
        |         WHEN h_fr = hm THEN 'fr' ELSE 'zh' END AS predicted
        |  FROM b),
        |cells AS (
        |  SELECT actual, predicted, count(*)::BIGINT AS n
        |  FROM pr GROUP BY actual, predicted)
        |SELECT actual, predicted, n,
        |  n::DOUBLE / (sum(n) OVER (PARTITION BY actual))::DOUBLE AS recall_frac
        |FROM cells ORDER BY actual, predicted""".stripMargin,

    // Fleiss re-derivation: same first-5 panel, (item, category) cells,
    // ragged-item gate, exact BIGINT sums S2/total/C2, then the three
    // single divisions in the engine's association order.
    "dq_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |f AS (SELECT user_id, event_type FROM r WHERE rn <= 5),
        |cells AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS o FROM f GROUP BY 1, 2),
        |keep AS (
        |  SELECT user_id FROM (SELECT user_id, sum(o) AS t FROM cells GROUP BY 1)
        |  WHERE t = 5),
        |kc AS (SELECT c.* FROM cells c JOIN keep k USING (user_id)),
        |s AS (
        |  SELECT coalesce(sum(o * o), 0)::BIGINT AS s2,
        |    coalesce(sum(o), 0)::BIGINT AS total FROM kc),
        |c2t AS (
        |  SELECT coalesce(sum(cj * cj), 0)::BIGINT AS c2 FROM (
        |    SELECT event_type, sum(o)::BIGINT AS cj FROM kc GROUP BY 1)),
        |st AS (
        |  SELECT (total // 5)::BIGINT AS n_items, 5::BIGINT AS n_raters,
        |    CASE WHEN total > 0
        |      THEN (s2 - total)::DOUBLE / (total * 4)::DOUBLE END AS p_bar,
        |    CASE WHEN total > 0
        |      THEN c2::DOUBLE / (total * total)::DOUBLE END AS p_e
        |  FROM s CROSS JOIN c2t)
        |SELECT n_items, n_raters, p_bar, p_e,
        |  CASE WHEN p_e < '1.0'::DOUBLE
        |       THEN (p_bar - p_e) / ('1.0'::DOUBLE - p_e) END AS kappa
        |FROM st""".stripMargin,

    // Cohen's kappa re-derivation: the dq_langid_confusion prediction
    // CTEs, then pure exact-integer marginal products and three single
    // exactly-rounded divisions in the engine's association order.
    "dq_cohen_kappa" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','una'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','和','有'))) AS h_zh
        |  FROM tk),
        |b AS (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS hm FROM h),
        |pr AS (
        |  SELECT lang AS a,
        |    CASE WHEN hm <= 0 THEN 'und'
        |         WHEN h_de = hm THEN 'de' WHEN h_en = hm THEN 'en' WHEN h_es = hm THEN 'es'
        |         WHEN h_fr = hm THEN 'fr' ELSE 'zh' END AS p
        |  FROM b),
        |cells AS (SELECT a, p, count(*)::BIGINT AS o FROM pr GROUP BY a, p),
        |ag AS (
        |  SELECT sum(o)::BIGINT AS n,
        |    sum(CASE WHEN a IS NOT DISTINCT FROM p THEN o ELSE 0 END)::BIGINT AS agree
        |  FROM cells),
        |rt AS (SELECT a, sum(o)::BIGINT AS mrt FROM cells GROUP BY a),
        |ct AS (SELECT p, sum(o)::BIGINT AS mct FROM cells GROUP BY p),
        |pn AS (
        |  SELECT coalesce(sum(mrt * mct), 0)::BIGINT AS pe_num
        |  FROM rt JOIN ct ON rt.a IS NOT DISTINCT FROM ct.p),
        |st AS (
        |  SELECT n, agree,
        |    agree::DOUBLE / n::DOUBLE AS po,
        |    pe_num::DOUBLE / (n * n)::DOUBLE AS pe
        |  FROM ag CROSS JOIN pn)
        |SELECT n, agree, po, pe,
        |  CASE WHEN pe < '1.0'::DOUBLE
        |       THEN (po - pe) / ('1.0'::DOUBLE - pe) END AS kappa
        |FROM st""".stripMargin,

    // pass@k re-derivation: same sequential product fold (list_reduce is
    // left-to-right like Spark's aggregate), same NULL / exact-1 edges.
    "dq_k_anonymity" ->
      """WITH cls AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(floor(value / 100) AS BIGINT) AS vband, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_classes,
        |  min(c)::BIGINT AS min_class_size,
        |  coalesce(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END), 0)::BIGINT AS n_classes_below_k,
        |  coalesce(sum(CASE WHEN c < 5 THEN c ELSE 0 END), 0)::BIGINT AS n_rows_below_k,
        |  min(c) >= 5 AS k_anonymous
        |FROM cls""".stripMargin,

    // Ref-integrity re-derivation: left join against distinct parent
    // keys, exact rollups, labeled union.
    "dq_ref_integrity" ->
      """WITH li AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk,
        |    count(*)::BIGINT AS n_child_rows,
        |    sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_fk,
        |    sum(CASE WHEN l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
        |             THEN 1 ELSE 0 END)::BIGINT AS n_orphans
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders
        |             WHERE o_orderkey IS NOT NULL) o
        |    ON o.o_orderkey = l.l_orderkey),
        |oc AS (
        |  SELECT 'orders.o_custkey->customer' AS fk,
        |    count(*)::BIGINT AS n_child_rows,
        |    sum(CASE WHEN ord.o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_fk,
        |    sum(CASE WHEN ord.o_custkey IS NOT NULL AND c.c_custkey IS NULL
        |             THEN 1 ELSE 0 END)::BIGINT AS n_orphans
        |  FROM orders ord
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |             WHERE c_custkey IS NOT NULL) c
        |    ON c.c_custkey = ord.o_custkey)
        |SELECT fk, n_child_rows, n_null_fk, n_orphans, n_orphans = 0 AS intact
        |FROM (SELECT * FROM li UNION ALL SELECT * FROM oc)
        |ORDER BY fk""".stripMargin,

    // t-closeness re-derivation: the (class × value) grid with null-safe
    // matches, exact cross-multiplied numerators, one IEEE chain.
    "dq_t_closeness" ->
      """WITH cells AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(floor(value / 100) AS BIGINT) AS vband,
        |    event_type::VARCHAR AS s, count(*)::BIGINT AS n_cs
        |  FROM events GROUP BY 1, 2, 3),
        |cls AS (SELECT day, vband, sum(n_cs)::BIGINT AS n_c FROM cells GROUP BY day, vband),
        |g AS (SELECT s, sum(n_cs)::BIGINT AS n_s FROM cells GROUP BY s),
        |tt AS (SELECT sum(n_s)::BIGINT AS nn FROM g),
        |grid AS (
        |  SELECT cls.day, cls.vband, cls.n_c, g.s, g.n_s,
        |    coalesce(c.n_cs, 0)::BIGINT AS n_cs, tt.nn
        |  FROM cls CROSS JOIN g
        |  LEFT JOIN cells c ON c.day IS NOT DISTINCT FROM cls.day
        |    AND c.vband IS NOT DISTINCT FROM cls.vband
        |    AND c.s IS NOT DISTINCT FROM g.s
        |  CROSS JOIN tt)
        |SELECT day, vband, n_c AS n,
        |  sum(abs(n_cs * nn - n_s * n_c))::BIGINT AS tvd_num,
        |  sum(abs(n_cs * nn - n_s * n_c))::DOUBLE
        |    / (2.0::DOUBLE * n_c::DOUBLE * nn::DOUBLE) AS tvd
        |FROM grid GROUP BY day, vband, n_c, nn
        |ORDER BY day, vband""".stripMargin,

    // l-diversity re-derivation: two-level class/sensitive aggregation,
    // exact rollups.
    "dq_l_diversity" ->
      """WITH cells AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(floor(value / 100) AS BIGINT) AS vband, event_type,
        |    count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2, 3),
        |cls AS (
        |  SELECT day, vband, sum(c)::BIGINT AS n, count(*)::BIGINT AS d
        |  FROM cells GROUP BY day, vband)
        |SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_classes,
        |  min(d)::BIGINT AS min_distinct_sensitive,
        |  coalesce(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END), 0)::BIGINT AS n_classes_below_l,
        |  coalesce(sum(CASE WHEN d < 2 THEN n ELSE 0 END), 0)::BIGINT AS n_rows_below_l,
        |  min(d) >= 2 AS l_diverse
        |FROM cls""".stripMargin,

    // Exact-quantiles re-derivation: the FLAT global rank (row_number
    // over a full sort) at the same discrete ranks — independent of the
    // engine's bucket-histogram selection.
    "dq_exact_quantiles" ->
      """WITH v AS (
        |  SELECT n_chars::BIGINT AS v FROM documents WHERE n_chars IS NOT NULL),
        |n AS (SELECT count(*)::BIGINT AS n FROM v),
        |r AS (
        |  SELECT q, n, ((n - 1) * q) // 100 + 1 AS rk
        |  FROM n CROSS JOIN (SELECT unnest([1, 25, 50, 75, 99]) AS q)),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
        |SELECT r.q::INT AS q, r.n AS n, r.rk::BIGINT AS rank, o.v AS value
        |FROM r JOIN o ON o.rn = r.rk
        |ORDER BY q""".stripMargin,

    // Pearson re-derivation: exact integer moments (HUGEINT sums cast
    // back to BIGINT), the engine's exact IEEE association order.
    "dq_key_audit" ->
      """WITH u AS (
        |  SELECT 'documents.doc_id' AS table_key, doc_id::VARCHAR AS k FROM documents
        |  UNION ALL
        |  SELECT 'events.event_id', event_id::VARCHAR FROM events
        |  UNION ALL
        |  SELECT 'lineitem.orderkey_linenumber',
        |    concat_ws(':', l_orderkey, l_linenumber) FROM lineitem),
        |m AS (SELECT table_key, k, count(*)::BIGINT AS c FROM u GROUP BY table_key, k)
        |SELECT table_key,
        |  sum(c)::BIGINT AS n_rows,
        |  coalesce(sum(CASE WHEN k IS NULL THEN c ELSE 0 END), 0)::BIGINT AS n_null_keys,
        |  count(CASE WHEN k IS NOT NULL THEN 1 END)::BIGINT AS n_keys,
        |  coalesce(sum(CASE WHEN k IS NOT NULL AND c > 1 THEN 1 ELSE 0 END), 0)::BIGINT
        |    AS n_dup_keys,
        |  coalesce(max(CASE WHEN k IS NOT NULL THEN c END), 0)::BIGINT AS max_multiplicity,
        |  coalesce(sum(CASE WHEN k IS NOT NULL AND c > 1 THEN c - 1 ELSE 0 END), 0)::BIGINT
        |    AS n_excess_rows
        |FROM m GROUP BY table_key ORDER BY table_key""".stripMargin,

    // Robust-outlier re-derivation: quantile_cont medians (the proven
    // interpolation contract), fixed-association IEEE deviations and
    // threshold, exact BIGINT counters.
    "dq_robust_outliers" ->
      """WITH b AS (
        |  SELECT event_type, value::DOUBLE AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(v, 0.5) AS median FROM b GROUP BY event_type),
        |d AS (
        |  SELECT b.event_type, abs(b.v - m.median) AS dev, m.median
        |  FROM b JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, count(*)::BIGINT AS n, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, md.n, m.median, md.mad,
        |  sum(CASE WHEN d.dev > 3.0::DOUBLE * md.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM d JOIN md USING (event_type) JOIN m USING (event_type)
        |GROUP BY d.event_type, md.n, m.median, md.mad
        |ORDER BY d.event_type""".stripMargin,

    // Krippendorff re-derivation: coincidence-matrix algebra over exact
    // BIGINT cell counts; the per-unit 1/(m-1) weight carried in micro
    // fixed point via `//` (truncation identical on both engines), every
    // shipped HUGEINT total cast back to BIGINT (the r7 physical-type
    // lesson).
    "dq_krippendorff_alpha" ->
      """WITH slots AS (
        |  SELECT CAST(event_id // 10 AS VARCHAR) AS u,
        |         CAST(event_id % 10 AS VARCHAR) AS a, min(event_type) AS l
        |  FROM events WHERE event_type IS NOT NULL AND event_id IS NOT NULL
        |  GROUP BY 1, 2),
        |cells AS (SELECT u, l, count(*)::BIGINT AS c FROM slots GROUP BY u, l),
        |units AS (
        |  SELECT u, sum(c)::BIGINT AS m, sum(c * c)::BIGINT AS sq
        |  FROM cells GROUP BY u HAVING sum(c) >= 2),
        |pc AS (SELECT cells.* FROM cells WHERE u IN (SELECT u FROM units)),
        |obs AS (
        |  SELECT count(*)::BIGINT AS n_units, sum(m)::BIGINT AS n,
        |    sum(((m * m - sq) * 1000000) // (m - 1))::BIGINT AS ufp
        |  FROM units),
        |marg AS (
        |  SELECT count(*)::BIGINT AS n_labels,
        |    coalesce(sum(nc * nc), 0)::BIGINT AS sqm
        |  FROM (SELECT l, sum(c)::BIGINT AS nc FROM pc GROUP BY l))
        |SELECT n_units, n AS n_ratings, n_labels,
        |  (ufp // n)::BIGINT AS do_fp,
        |  (((n * n - sqm) * 1000000) // (n * (n - 1)))::BIGINT AS de_fp,
        |  CASE WHEN n * n = sqm THEN NULL
        |       ELSE (1000000 - (((n - 1) * ufp) // (n * n - sqm)))::BIGINT
        |  END AS alpha_fp
        |FROM obs CROSS JOIN marg""".stripMargin,

    // Label-balance re-derivation: exact-rational shares, ln riding
    // round-then-decimal contributions, totals STAYING decimal (the
    // gini subtraction narrows before subtracting, mirroring the engine).
    "dq_label_balance" -> PinnedOracles.sql("dq_label_balance"),

    // Classification report re-derivation: the langid prediction CTEs,
    // union class set via null-safe full outer, single-chain divisions.
    "dq_classification_report" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','una'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','和','有'))) AS h_zh
        |  FROM tk),
        |b AS (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS hm FROM h),
        |pr AS (
        |  SELECT lang AS a,
        |    CASE WHEN hm <= 0 THEN 'und'
        |         WHEN h_de = hm THEN 'de' WHEN h_en = hm THEN 'en' WHEN h_es = hm THEN 'es'
        |         WHEN h_fr = hm THEN 'fr' ELSE 'zh' END AS p
        |  FROM b),
        |cells AS (SELECT a, p, count(*)::BIGINT AS o FROM pr GROUP BY a, p),
        |at AS (SELECT a, sum(o)::BIGINT AS support FROM cells GROUP BY a),
        |pt AS (SELECT p, sum(o)::BIGINT AS n_pred FROM cells GROUP BY p),
        |tpc AS (SELECT a AS c, o AS tp FROM cells WHERE a IS NOT DISTINCT FROM p),
        |cls AS (
        |  SELECT coalesce(at.a, pt.p) AS class,
        |    coalesce(support, 0)::BIGINT AS support,
        |    coalesce(n_pred, 0)::BIGINT AS n_pred
        |  FROM at FULL OUTER JOIN pt ON at.a IS NOT DISTINCT FROM pt.p),
        |j AS (
        |  SELECT class, support, n_pred, coalesce(tpc.tp, 0)::BIGINT AS tp
        |  FROM cls LEFT JOIN tpc ON cls.class IS NOT DISTINCT FROM tpc.c),
        |w AS (
        |  SELECT class, support, n_pred, tp,
        |    CASE WHEN n_pred > 0 THEN tp::DOUBLE / n_pred::DOUBLE END AS "precision",
        |    CASE WHEN support > 0 THEN tp::DOUBLE / support::DOUBLE END AS recall
        |  FROM j)
        |SELECT class, support, n_pred, tp, "precision", recall,
        |  CASE WHEN "precision" + recall > '0.0'::DOUBLE
        |       THEN '2.0'::DOUBLE * "precision" * recall / ("precision" + recall)
        |  END AS f1
        |FROM w ORDER BY class""".stripMargin,

    // Calibration: the txt_quality_model score CTE joined to the lang=en
    // label, psi-style clamped binning, round-then-decimal-summed mean
    // scores, single trailing divisions.
    // Wilson re-derivation: langid prediction CTEs carrying source, one
    // accuracy agg, then the interval chain in the engine's association
    // order (every op exactly-rounded IEEE, sqrt included).
    "dq_rate_wilson" ->
      """WITH tk AS (
        |  SELECT doc_id, source, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, source, lang,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','una'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','和','有'))) AS h_zh
        |  FROM tk),
        |b AS (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS hm FROM h),
        |pr AS (
        |  SELECT source, lang,
        |    CASE WHEN hm <= 0 THEN 'und'
        |         WHEN h_de = hm THEN 'de' WHEN h_en = hm THEN 'en' WHEN h_es = hm THEN 'es'
        |         WHEN h_fr = hm THEN 'fr' ELSE 'zh' END AS p
        |  FROM b),
        |g AS (
        |  SELECT source::VARCHAR AS "group", count(*)::BIGINT AS n,
        |    sum((p IS NOT DISTINCT FROM lang)::INT)::BIGINT AS k
        |  FROM pr GROUP BY 1),
        |c AS (SELECT "group", n, k, k::DOUBLE / n::DOUBLE AS p, n::DOUBLE AS nd,
        |  ('1.96'::DOUBLE * '1.96'::DOUBLE) AS z2 FROM g),
        |c3 AS (SELECT *,
        |  p + z2 / ('2.0'::DOUBLE * nd) AS center,
        |  '1.96'::DOUBLE * sqrt(p * ('1.0'::DOUBLE - p) / nd
        |    + z2 / ('4.0'::DOUBLE * (nd * nd))) AS half,
        |  '1.0'::DOUBLE + z2 / nd AS denom FROM c)
        |SELECT "group", n, k, p AS rate,
        |  greatest('0.0'::DOUBLE, (center - half) / denom) AS lo,
        |  least('1.0'::DOUBLE, (center + half) / denom) AS hi
        |FROM c3 ORDER BY "group"""".stripMargin,

    // Binned-AUC re-derivation: the calibration score CTEs, full bin
    // spine, descending cumulative TP/FP, the exact BIGINT trapezoid
    // numerator, one trailing division.
    "dq_binned_auc" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
         |  FROM documents),
         |b AS (SELECT doc_id,
         |        [${graft.operators.QualityModel.weightsMilli.mkString(", ")}]
         |          [((('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1)::INT] AS w
         |      FROM tok),
         |s AS (SELECT doc_id, sum(w)::BIGINT AS sw, count(*)::BIGINT AS n FROM b GROUP BY doc_id),
         |sc AS (
         |  SELECT d.doc_id AS id,
         |    CASE WHEN s.n IS NULL OR s.n = 0 THEN 0.0
         |         ELSE sw::DOUBLE / 1000.0 / n END AS score
         |  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
         |lab AS (SELECT doc_id AS id, (lang = 'en') AS y FROM documents),
         |j AS (
         |  SELECT sc.score AS sv, lab.y FROM sc JOIN lab USING (id)
         |  WHERE sc.score IS NOT NULL AND lab.y IS NOT NULL),
         |g AS (
         |  SELECT least(9, greatest(0,
         |      floor((sv - '-0.5'::DOUBLE) * '10.0'::DOUBLE / '1.0'::DOUBLE)::INT)) AS bucket,
         |    sum(y::INT)::BIGINT AS n_pos, sum((NOT y)::INT)::BIGINT AS n_neg
         |  FROM j GROUP BY 1),
         |spine AS (
         |  SELECT b.bucket, coalesce(g.n_pos, 0)::BIGINT AS n_pos,
         |    coalesce(g.n_neg, 0)::BIGINT AS n_neg
         |  FROM (SELECT unnest(range(10)) AS bucket) b
         |  LEFT JOIN g ON g.bucket = b.bucket),
         |t AS (SELECT sum(n_pos)::BIGINT AS p, sum(n_neg)::BIGINT AS nn FROM spine),
         |c AS (
         |  SELECT bucket, n_pos, n_neg,
         |    sum(n_pos) OVER (ORDER BY bucket DESC)::BIGINT AS cum_tp,
         |    sum(n_neg) OVER (ORDER BY bucket DESC)::BIGINT AS cum_fp,
         |    (n_neg * (2 * (sum(n_pos) OVER (ORDER BY bucket DESC) - n_pos) + n_pos))::BIGINT
         |      AS term
         |  FROM spine),
         |a AS (SELECT (sum(term)::DOUBLE / (2 * t.p * t.nn)::DOUBLE) AS auc
         |      FROM c CROSS JOIN t GROUP BY t.p, t.nn)
         |SELECT c.bucket, c.n_pos, c.n_neg, c.cum_tp, c.cum_fp,
         |  c.cum_tp::DOUBLE / t.p::DOUBLE AS tpr,
         |  c.cum_fp::DOUBLE / t.nn::DOUBLE AS fpr,
         |  a.auc
         |FROM c CROSS JOIN t CROSS JOIN a ORDER BY bucket DESC""".stripMargin,

    "dq_calibration" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
         |  FROM documents),
         |b AS (SELECT doc_id,
         |        [${graft.operators.QualityModel.weightsMilli.mkString(", ")}]
         |          [((('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1)::INT] AS w
         |      FROM tok),
         |s AS (SELECT doc_id, sum(w)::BIGINT AS sw, count(*)::BIGINT AS n FROM b GROUP BY doc_id),
         |sc AS (
         |  SELECT d.doc_id AS id,
         |    CASE WHEN s.n IS NULL OR s.n = 0 THEN 0.0
         |         ELSE sw::DOUBLE / 1000.0 / n END AS score
         |  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
         |lab AS (SELECT doc_id AS id, (lang = 'en') AS y FROM documents),
         |j AS (
         |  SELECT sc.score AS sv, lab.y FROM sc JOIN lab USING (id)
         |  WHERE sc.score IS NOT NULL AND lab.y IS NOT NULL),
         |g AS (
         |  SELECT least(9, greatest(0,
         |      floor((sv - '-0.5'::DOUBLE) * '10.0'::DOUBLE / '1.0'::DOUBLE)::INT)) AS bucket,
         |    count(*)::BIGINT AS n, sum(y::INT)::BIGINT AS n_pos,
         |    sum(round(sv, 9)::DECIMAL(28,9))::DOUBLE / count(*)::DOUBLE AS mean_score
         |  FROM j GROUP BY 1)
         |SELECT bucket, n, n_pos, mean_score,
         |  n_pos::DOUBLE / n::DOUBLE AS pos_rate
         |FROM g ORDER BY bucket""".stripMargin,

    // OOV rate: vocab re-derived as the txt_vocabulary top-20 cut, token
    // stream left-joined against it, doc spine restored so empty/null
    // docs keep their row (unnest drops them in DuckDB; the engine's
    // explode_outer keeps them).
    "e_windowed_drift_fx" -> PinnedOracles.sql("e_windowed_drift_fx"),

    // NFC parity: DuckDB's nfc_normalize is an INDEPENDENT Unicode NFC
    // implementation — agreement cross-validates both engines' tables.
    "dq_monotonicity" ->
      """WITH m AS (
        |  SELECT floor(value * 100)::BIGINT AS s, (event_type = 'click') AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |ps AS (
        |  SELECT s, count(*) AS n, sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
        |  FROM m GROUP BY s),
        |st AS (
        |  SELECT n, np,
        |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(n) OVER () AS total
        |  FROM ps),
        |b AS (SELECT ((cum - 1) * 10) // total AS bucket, n, np FROM st),
        |r AS (
        |  SELECT bucket::BIGINT AS bucket, sum(n)::BIGINT AS n,
        |    sum(np)::BIGINT AS n_pos,
        |    ((sum(np) * 1000000000) // sum(n))::BIGINT AS pos_rate_n9
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n, n_pos, pos_rate_n9,
        |  coalesce(pos_rate_n9 < lag(pos_rate_n9) OVER (ORDER BY bucket), false)
        |    AS is_violation
        |FROM r ORDER BY bucket""".stripMargin,

    // Percentile re-derivation: RANGE-frame cume count over the same
    // (source, n_chars) order, integer share.
    "e_hourly_active_users" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hr,
        |  count(DISTINCT user_id)::BIGINT AS n_users, count(*)::BIGINT AS n_events
        |FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1 ORDER BY hr""".stripMargin,

    // Rolling-active re-derivation: distinct user-hours, 24-shift
    // unnest, distinct count per window end; µs epochs via the proven
    // epoch_us ↔ unix_micros parity (NS files truncate through ::TIMESTAMP
    // exactly like the loader's ns->µs div).
    "e_rolling_active_users" ->
      """WITH ub AS (
        |  SELECT DISTINCT user_id AS u,
        |    epoch_us(ts::TIMESTAMP) // 3600000000 AS b
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |w AS (
        |  SELECT DISTINCT u, unnest(range(b, b + 24)) AS window_end FROM ub),
        |c AS (SELECT window_end, count(*)::BIGINT AS n_users FROM w GROUP BY window_end),
        |spine AS (
        |  SELECT unnest(range(min(b), max(b) + 24)) AS window_end FROM ub)
        |SELECT s.window_end,
        |  strftime(to_timestamp((s.window_end - 23) * 3600), '%Y-%m-%d %H:%M:%S')
        |    AS window_start_ts,
        |  coalesce(c.n_users, 0)::BIGINT AS n_users
        |FROM spine s LEFT JOIN c ON c.window_end = s.window_end
        |ORDER BY s.window_end""".stripMargin,

    // DF-profile re-derivation: the shared shingle contract, df per
    // shingle, shingles per df.
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "e_interval_join" ->
      """SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_str,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_str
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND l.event_type = 'view' AND r.event_type = 'purchase'
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE
        |ORDER BY l.user_id, l_id, r_id""".stripMargin,

    // Incremental rollup: the oracle recomputes DIRECTLY over the full
    // table — equality proves merge(batch states) == full recompute.
    "e_incremental_rollup" ->
      """SELECT user_id, count(value) AS n,
        |  sum(round(value, 9)::DECIMAL(28,9))::DOUBLE AS sum_v,
        |  CASE WHEN count(value) > 0
        |       THEN sum(round(value, 9)::DECIMAL(28,9))::DOUBLE / count(value)::DOUBLE END AS mean_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Hourly-Wilson re-derivation: the dq_rate_wilson IEEE chain keyed
    // by the hour string.
    "e_error_rate_wilson" ->
      """WITH g AS (
        |  SELECT strftime(ts, '%Y-%m-%d %H') AS "group", count(*)::BIGINT AS n,
        |    sum((event_type IS NOT DISTINCT FROM 'error')::INT)::BIGINT AS k
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |c AS (SELECT "group", n, k, k::DOUBLE / n::DOUBLE AS p, n::DOUBLE AS nd,
        |  ('1.96'::DOUBLE * '1.96'::DOUBLE) AS z2 FROM g),
        |c3 AS (SELECT *,
        |  p + z2 / ('2.0'::DOUBLE * nd) AS center,
        |  '1.96'::DOUBLE * sqrt(p * ('1.0'::DOUBLE - p) / nd
        |    + z2 / ('4.0'::DOUBLE * (nd * nd))) AS half,
        |  '1.0'::DOUBLE + z2 / nd AS denom FROM c)
        |SELECT "group", n, k, p AS rate,
        |  greatest('0.0'::DOUBLE, (center - half) / denom) AS lo,
        |  least('1.0'::DOUBLE, (center + half) / denom) AS hi
        |FROM c3 ORDER BY "group"""".stripMargin,

    // Sliding-window re-derivation: every event unnests into its two
    // panes (epoch-aligned 2h/1h grid), exact counts.
    "e_sliding_window" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS ws, event_type
        |  FROM events, LATERAL unnest([0, 1]) AS t(o)
        |  WHERE ts IS NOT NULL)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*)::BIGINT AS n
        |FROM w GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // EWMA re-derivation: identical exact-cents means, then the SAME
    // fixed-order fold replayed by a recursive CTE over the per-key
    // bucket index — each step one IEEE multiply-add with the same
    // 0.3/0.7 literals, so every intermediate is bit-identical.
    "e_ewma_baseline" ->
      """WITH b AS (
        |  SELECT event_type::VARCHAR AS key, epoch_us(ts) // 3600000000 AS bucket,
        |    count(*)::BIGINT AS n,
        |    sum(CAST(floor(value * 100) AS BIGINT))::BIGINT AS sc
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT key, bucket, n, (sc::DOUBLE / '100.0'::DOUBLE) / n::DOUBLE AS mean_v,
        |    row_number() OVER (PARTITION BY key ORDER BY bucket) AS idx
        |  FROM b),
        |e AS (
        |  WITH RECURSIVE r AS (
        |    SELECT key, bucket, n, mean_v, idx, mean_v AS ewma FROM m WHERE idx = 1
        |    UNION ALL
        |    SELECT m.key, m.bucket, m.n, m.mean_v, m.idx,
        |      '0.3'::DOUBLE * m.mean_v + '0.7'::DOUBLE * r.ewma
        |    FROM m JOIN r ON r.key = m.key AND m.idx = r.idx + 1)
        |  SELECT * FROM r)
        |SELECT key, bucket,
        |  strftime(make_timestamp(bucket * 3600000000), '%Y-%m-%d %H:%M:%S') AS bucket_start,
        |  n, mean_v, ewma
        |FROM e ORDER BY key, bucket""".stripMargin,

    // Windowed heavy hitters re-derivation: per-hour exact counts, one
    // row_number per window at (n desc, category), k=3 cut.
    "e_windowed_topk" ->
      """WITH cnt AS (
        |  SELECT date_trunc('hour', ts) AS w, event_type::VARCHAR AS category,
        |    count(*)::BIGINT AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT w, category, n,
        |    row_number() OVER (PARTITION BY w ORDER BY n DESC, category ASC)::INTEGER AS rank
        |  FROM cnt)
        |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, category, n, rank
        |FROM r WHERE rank <= 3 ORDER BY window_start, rank""".stripMargin,

    // Windowed-W1 re-derivation: global reference bins, per-hour bins on
    // the same clamped grid, the full (window × bucket) grid with
    // per-window cumulative sums, exact |cum_w·t_ref − cum_ref·t_w|
    // numerators, two trailing IEEE ops per window.
    "e_windowed_wdrift" ->
      """WITH v AS (
        |  SELECT date_trunc('hour', ts) AS w,
        |    least(9, greatest(0, floor((value::DOUBLE - 0) * 10 / 1000.0::DOUBLE)::INT)) AS bucket
        |  FROM events WHERE value IS NOT NULL),
        |ref AS (SELECT bucket, count(*)::BIGINT AS ref_n FROM v GROUP BY bucket),
        |bins AS (
        |  SELECT b.bucket, coalesce(ref.ref_n, 0)::BIGINT AS ref_n
        |  FROM (SELECT unnest(range(10))::INT AS bucket) b
        |  LEFT JOIN ref ON ref.bucket = b.bucket),
        |rt AS (SELECT sum(ref_n)::BIGINT AS t_ref FROM bins),
        |wc AS (SELECT w, bucket, count(*)::BIGINT AS n FROM v GROUP BY w, bucket),
        |wins AS (SELECT w, sum(n)::BIGINT AS t_w FROM wc GROUP BY w),
        |grid AS (
        |  SELECT wins.w, bins.bucket, bins.ref_n, wins.t_w,
        |    coalesce(wc.n, 0)::BIGINT AS n
        |  FROM wins CROSS JOIN bins
        |  LEFT JOIN wc ON wc.w = wins.w AND wc.bucket = bins.bucket),
        |cum AS (
        |  SELECT w, bucket, n, t_w,
        |    sum(n) OVER (PARTITION BY w ORDER BY bucket)::BIGINT AS cum_n,
        |    sum(ref_n) OVER (PARTITION BY w ORDER BY bucket)::BIGINT AS cum_ref
        |  FROM grid),
        |d AS (
        |  SELECT cum.*, rt.t_ref,
        |    abs(cum_n * rt.t_ref - cum_ref * t_w)::BIGINT AS diff_num
        |  FROM cum CROSS JOIN rt),
        |w1 AS (
        |  SELECT w, sum(diff_num)::BIGINT AS w1_num,
        |    sum(diff_num)::DOUBLE / (any_value(t_w) * any_value(t_ref))::DOUBLE
        |      * (1000.0::DOUBLE / 10) AS w1
        |  FROM d GROUP BY w)
        |SELECT strftime(d.w, '%Y-%m-%d %H:%M:%S') AS window_start, d.bucket, d.n,
        |  d.cum_n, d.diff_num, w1.w1_num, w1.w1
        |FROM d JOIN w1 ON w1.w = d.w
        |ORDER BY window_start, d.bucket""".stripMargin,

    // Trend re-derivation: group-centered minute x (`//` truncation),
    // exact integer moments, one IEEE division; HUGEINT products cast
    // back to BIGINT.
    "e_trend_slopes" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 100) AS BIGINT) AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |t0 AS (SELECT event_type, min(us) AS us0 FROM b GROUP BY event_type),
        |xy AS (
        |  SELECT b.event_type, (b.us - t0.us0) // 60000000 AS x, b.y
        |  FROM b JOIN t0 USING (event_type)),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
        |  FROM xy GROUP BY event_type)
        |SELECT event_type, n,
        |  (n * sxy - sx * sy)::BIGINT AS slope_num,
        |  (n * sxx - sx * sx)::BIGINT AS slope_den,
        |  CASE WHEN n * sxx - sx * sx > 0
        |       THEN (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
        |  END AS slope
        |FROM m ORDER BY event_type""".stripMargin,

    // Growth re-derivation: champion-min debut, per-day rollup, running
    // sum over the day summary; second-precision string buckets.
    "e_user_growth" ->
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY user_id),
        |g AS (SELECT d, count(*)::BIGINT AS n_new FROM f GROUP BY d)
        |SELECT strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket_start, n_new,
        |  sum(n_new) OVER (ORDER BY d)::BIGINT AS cum_users
        |FROM g ORDER BY bucket_start""".stripMargin,

    // Guarded-join oracle: the plain join — equality proves the guard
    // column was pass-through (no multiplicity violated, nothing added).
    "e_cdc_apply" ->
      """WITH snap AS (
        |  SELECT event_id // 3 AS k, value, event_type AS etype
        |  FROM events WHERE event_id % 3 = 0),
        |ch AS (
        |  SELECT event_id // 3 AS k, event_id AS v,
        |    CASE WHEN event_type = 'error' THEN 'D'
        |         WHEN event_id % 3 = 1 THEN 'U' ELSE 'I' END AS op,
        |    value, event_type AS etype
        |  FROM events WHERE event_id % 3 <> 0),
        |w AS (
        |  SELECT k, op, value, etype FROM (
        |    SELECT k, op, value, etype,
        |      row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT COALESCE(w.k, s.k)::BIGINT AS key,
        |  CASE WHEN w.k IS NOT NULL THEN w.value ELSE s.value END AS value,
        |  CASE WHEN w.k IS NOT NULL THEN w.etype ELSE s.etype END AS etype
        |FROM snap s FULL OUTER JOIN w ON w.k = s.k
        |WHERE w.op IS NULL OR w.op <> 'D'
        |ORDER BY key""".stripMargin,

    "e_interval_join_outer" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'view'),
        |     r AS (SELECT * FROM events WHERE event_type = 'purchase')
        |SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_str,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_str
        |FROM l LEFT JOIN r
        |  ON l.user_id = r.user_id
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE
        |ORDER BY l.user_id, l_id, r_id""".stripMargin,

    // SCD2: the merge-rule union re-derived case by case (null-safe
    // value compare via IS DISTINCT FROM).
    "e_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_str, event_type,
        |  count(*) AS n, sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin,

    // Windowed-drift re-derivation: reference counts, per-hour folded
    // counts, the full (window x category+<other>) grid, Laplace shares,
    // decimal contributions, decimal per-window psi.
    "e_windowed_drift" -> PinnedOracles.sql("e_windowed_drift"),

    // Expected rows: user 1 converts twice inside 15 min, user 2 is 5 min
    // late, user 3 hits the inclusive boundary exactly.
    "e_stream_dedup" ->
      """SELECT md5(user_id::VARCHAR || ':' || coalesce(event_type, '')) AS fingerprint,
        |  min(event_id)::BIGINT AS event_id, count(*)::BIGINT AS n_dups
        |FROM events GROUP BY 1 ORDER BY event_id""".stripMargin,

    "e_interval_join_fx" ->
      """SELECT c0::BIGINT AS user_id, c1::BIGINT AS l_id, c2::BIGINT AS r_id
        |FROM (VALUES (1, 1, 11), (1, 1, 12), (3, 3, 14)) AS t(c0, c1, c2)
        |ORDER BY user_id, l_id, r_id""".stripMargin,

    "e_stream_window_fx" -> PinnedOracles.sql("e_stream_window_fx"),

    "e_session_window_fx" -> PinnedOracles.sql("e_session_window_fx"),

    // Gap sessionization: lag-based new-session flags + running sum; a
    // session ends 30 minutes after its last event (session_window
    // semantics: merge while next.ts < prev.ts + gap).
    "e_session_window" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), g AS (
        |  SELECT *, sum(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  user_id, count(*) AS n,
        |  sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "e_stateful_rollup" ->
      """SELECT user_id, count(*) AS n,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e_json_props" ->
      """SELECT event_id, json_extract(props, '$.k')::INTEGER AS k
        |FROM events ORDER BY event_id""".stripMargin,

    // REAL-decode feature extraction (round-12, de-pinned): image block
    // means re-derived from the lossless fixture formula, audio block
    // means from the raw text bytes (hex slices) — exact integer sums,
    // one IEEE division per block.
    "mm_feature_extract" ->
      s"""WITH ${mmPixelCtes(50)},
         |img AS (
         |  SELECT id, 'image' AS media_type, TRUE AS decoded,
         |    w::INTEGER AS width, h::INTEGER AS height,
         |    len(p)::BIGINT AS n_values, p AS v
         |  FROM mpx WHERE id % 2 = 0),
         |aud0 AS (
         |  SELECT doc_id AS id, hex(text::BLOB) AS hx,
         |    octet_length(text::BLOB)::BIGINT AS n
         |  FROM documents WHERE doc_id < 50 AND doc_id % 2 = 1),
         |aud AS (
         |  SELECT id, 'audio' AS media_type, FALSE AS decoded,
         |    (-1)::INTEGER AS width, (-1)::INTEGER AS height, n AS n_values,
         |    list_transform(range(n),
         |      i -> ('0x' || substring(hx, CAST(i*2+1 AS BIGINT), 2))::BIGINT) AS v
         |  FROM aud0),
         |allv AS (SELECT * FROM img UNION ALL SELECT * FROM aud),
         |f AS (
         |  SELECT id, media_type, decoded, width, height, n_values, j AS pos,
         |    CASE WHEN ((j+1)*n_values)//8 > (j*n_values)//8
         |      THEN list_reduce(list_prepend(0::BIGINT,
         |             v[(j*n_values)//8 + 1 : ((j+1)*n_values)//8]), (a,b) -> a+b)::DOUBLE
         |           / (((j+1)*n_values)//8 - (j*n_values)//8)
         |      ELSE 0.0::DOUBLE END AS feature
         |  FROM allv CROSS JOIN (SELECT unnest(range(8)) AS j))
         |SELECT id AS media_id, media_type, decoded, width, height, n_values,
         |  pos::BIGINT AS pos, feature
         |FROM f ORDER BY media_id, pos""".stripMargin,

    // Decode-metadata re-derivation: the formula raster's dimensions and
    // the md5 of its uppercase hex — any deviation in the engine's REAL
    // ImageIO decode breaks the hash.
    // PCM framing re-derivation: the formula waveform (no bytes — the
    // byte packing/unpacking round-trip is exactly what the engine side
    // proves), LAG within (id, frame) for the crossing predicate, exact
    // BIGINT aggregates.
    "mm_audio_frames" ->
      s"""WITH ${mmAudioCtes(40)},
         |fr AS (
         |  SELECT id, t // 256 AS frame_idx, s,
         |    lag(s) OVER (PARTITION BY id, t // 256 ORDER BY t) AS prev
         |  FROM smp)
         |SELECT id AS media_id, frame_idx::BIGINT AS frame_idx,
         |  count(*)::BIGINT AS n_samples,
         |  sum(abs(s))::BIGINT AS energy_l1,
         |  sum(CASE WHEN prev IS NOT NULL AND s * prev < 0 THEN 1 ELSE 0 END)::BIGINT
         |    AS zero_crossings,
         |  min(s)::BIGINT AS peak_min, max(s)::BIGINT AS peak_max
         |FROM fr GROUP BY id, frame_idx
         |ORDER BY media_id, frame_idx""".stripMargin,

    // AVI-index re-derivation: every field from the fixture layout —
    // the resolved data offset 116 + jl + f·(8+fb) must come out
    // IDENTICAL for both idx1 offset conventions, and each frame's md5
    // re-derives from the frame-byte formula.
    "mm_avi_index" ->
      s"""WITH ${mmAviCtes(40)},
         |fr AS (
         |  SELECT id, f.range AS f, fb, jl FROM afx, range(0, 10) f
         |  WHERE NOT raw AND f.range < nf)
         |SELECT id AS media_id, f::BIGINT AS frame_idx, f % 3 = 0 AS is_key,
         |  (116 + jl + f * (8 + fb))::BIGINT AS "offset",
         |  fb::BIGINT AS n_bytes,
         |  md5(list_aggregate(list_transform(range(fb),
         |    j -> printf('%02X', (id*17 + f*29 + j*3) % 256)), 'string_agg', '')) AS frame_md5
         |FROM fr ORDER BY media_id, frame_idx""".stripMargin,

    // Real-frame-sampling re-derivation: per container, samples at
    // k·100 ms for k < max(1, nf·usf // 100000) (nested floor divisions
    // collapse), raw frame = min(nf−1, k·100000 // usf), snapped to
    // f − f%3 (the fixture's keyframe cadence), md5 from the frame
    // formula; per fallback row, the stub slice formula at
    // offset (k·len)//n, 24-byte cap.
    "mm_real_frames" ->
      s"""WITH ${mmAviCtes(40)},
         |av AS (
         |  SELECT id, fb, usf, k.range AS k,
         |    least(nf - 1, k.range * 100000 // usf) AS rawf
         |  FROM afx, range(0, 5) k
         |  WHERE NOT raw AND k.range < greatest(1, nf * usf // 100000)),
         |avo AS (SELECT id, k, fb, rawf - rawf % 3 AS f FROM av),
         |rw AS (
         |  SELECT id, len, k.range AS k, greatest(1, len // 100) AS n
         |  FROM afx, range(0, 3) k
         |  WHERE raw AND k.range < greatest(1, len // 100)),
         |rwo AS (
         |  SELECT id, k, (k * len) // n AS o,
         |    least(24, len - (k * len) // n) AS sl
         |  FROM rw)
         |SELECT id AS media_id, k::BIGINT AS frame_idx, (k * 100)::BIGINT AS ts_ms,
         |  fb::BIGINT AS n_bytes,
         |  md5(list_aggregate(list_transform(range(fb),
         |    j -> printf('%02X', (id*17 + f*29 + j*3) % 256)), 'string_agg', '')) AS frame_md5
         |FROM avo
         |UNION ALL
         |SELECT id, k::BIGINT, (k * 100)::BIGINT, sl::BIGINT,
         |  md5(list_aggregate(list_transform(range(sl),
         |    j -> printf('%02X', (id*11 + (o + j)*7) % 256)), 'string_agg', ''))
         |FROM rwo
         |ORDER BY media_id, frame_idx""".stripMargin,

    // WAV-metadata re-derivation: every field from the fixture layout
    // formulas — data_offset = 52 + junk length for containers, the
    // raw-PCM fallback constants for headerless rows, duration as the
    // same floor division the engine computes.
    "mm_wav_meta" ->
      s"""WITH ${mmWavCtes(40)}
         |SELECT id AS media_id, NOT raw AS parsed,
         |  1::BIGINT AS audio_format,
         |  (CASE WHEN raw THEN 1 ELSE c END)::BIGINT AS channels,
         |  (CASE WHEN raw THEN 0 ELSE rate END)::BIGINT AS sample_rate,
         |  16::BIGINT AS bits_per_sample,
         |  (CASE WHEN raw THEN 2 ELSE c * 2 END)::BIGINT AS block_align,
         |  (CASE WHEN raw THEN 1000 ELSE m END)::BIGINT AS n_frames,
         |  (CASE WHEN raw THEN -1 ELSE m * 1000 // rate END)::BIGINT AS duration_ms,
         |  (CASE WHEN raw THEN 0 ELSE 52 + jl END)::BIGINT AS data_offset,
         |  (CASE WHEN raw THEN 2000 ELSE m * c * 2 END)::BIGINT AS data_bytes
         |FROM wfx ORDER BY media_id""".stripMargin,

    // Channel-0-through-the-container re-derivation: the ch=0 sample
    // formula over each row's true frame count (m for containers, 1000
    // for raw), framed at 200 like mm_audio_frames' replay.
    "mm_wav_frames" ->
      s"""WITH ${mmWavCtes(40)},
         |smp AS (
         |  SELECT w.id, tt.range AS t, (w.id * 7 + tt.range * 13) % 4097 - 2048 AS s
         |  FROM wfx w, range(0, 1000) tt
         |  WHERE tt.range < CASE WHEN w.raw THEN 1000 ELSE w.m END),
         |fr AS (
         |  SELECT id, t // 200 AS frame_idx, s,
         |    lag(s) OVER (PARTITION BY id, t // 200 ORDER BY t) AS prev
         |  FROM smp)
         |SELECT id AS media_id, frame_idx::BIGINT AS frame_idx,
         |  count(*)::BIGINT AS n_samples,
         |  sum(abs(s))::BIGINT AS energy_l1,
         |  sum(CASE WHEN prev IS NOT NULL AND s * prev < 0 THEN 1 ELSE 0 END)::BIGINT
         |    AS zero_crossings,
         |  min(s)::BIGINT AS peak_min, max(s)::BIGINT AS peak_max
         |FROM fr GROUP BY id, frame_idx
         |ORDER BY media_id, frame_idx""".stripMargin,

    // Time-based VAD re-derivation: the mm_audio_vad islands replay over
    // container rows only (raw rows carry no rate), frame 100, plus the
    // floor-div ms conversion at each span's bounds.
    "mm_wav_vad_ms" ->
      s"""WITH ${mmWavCtes(40)},
         |smp AS (
         |  SELECT w.id, w.rate, tt.range AS t,
         |    (w.id * 7 + tt.range * 13) % 4097 - 2048 AS s
         |  FROM wfx w, range(0, 1000) tt
         |  WHERE NOT w.raw AND tt.range < w.m),
         |fr AS (
         |  SELECT id, rate, t // 100 AS frame_idx,
         |    count(*)::BIGINT AS n_samples, sum(abs(s))::BIGINT AS energy_l1
         |  FROM smp GROUP BY id, rate, t // 100),
         |kept AS (
         |  SELECT id, rate, frame_idx, energy_l1,
         |    lag(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx) AS prev
         |  FROM fr WHERE energy_l1 >= 1000 * n_samples),
         |br AS (
         |  SELECT id, rate, frame_idx, energy_l1,
         |    CASE WHEN prev IS NULL OR frame_idx <> prev + 1 THEN 1 ELSE 0 END AS brk
         |  FROM kept),
         |sp AS (
         |  SELECT id, rate, frame_idx, energy_l1,
         |    sum(brk) OVER (PARTITION BY id ORDER BY frame_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
         |  FROM br)
         |SELECT id AS media_id, min(frame_idx)::BIGINT AS span_start,
         |  max(frame_idx)::BIGINT AS span_end,
         |  (min(frame_idx) * 100 * 1000 // min(rate))::BIGINT AS span_start_ms,
         |  ((max(frame_idx) + 1) * 100 * 1000 // min(rate))::BIGINT AS span_end_ms,
         |  count(*)::BIGINT AS n_frames,
         |  sum(energy_l1)::BIGINT AS energy_l1
         |FROM sp GROUP BY id, span
         |ORDER BY media_id, span_start""".stripMargin,

    // VAD re-derivation: formula frames at 128 samples, the integer
    // mean gate, LAG-gap islands per id, span aggregates.
    "mm_audio_vad" ->
      s"""WITH ${mmAudioCtes(40)},
         |fr AS (
         |  SELECT id, t // 128 AS frame_idx,
         |    count(*)::BIGINT AS n_samples, sum(abs(s))::BIGINT AS energy_l1
         |  FROM smp GROUP BY id, t // 128),
         |kept AS (
         |  SELECT id, frame_idx, energy_l1,
         |    lag(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx) AS prev
         |  FROM fr WHERE energy_l1 >= 1000 * n_samples),
         |br AS (
         |  SELECT id, frame_idx, energy_l1,
         |    CASE WHEN prev IS NULL OR frame_idx <> prev + 1 THEN 1 ELSE 0 END AS brk
         |  FROM kept),
         |sp AS (
         |  SELECT id, frame_idx, energy_l1,
         |    sum(brk) OVER (PARTITION BY id ORDER BY frame_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
         |  FROM br)
         |SELECT id AS media_id, min(frame_idx)::BIGINT AS span_start,
         |  max(frame_idx)::BIGINT AS span_end, count(*)::BIGINT AS n_frames,
         |  sum(energy_l1)::BIGINT AS energy_l1
         |FROM sp GROUP BY id, span
         |ORDER BY media_id, span_start""".stripMargin,

    "mm_decode_meta" ->
      s"""WITH ${mmPixelCtes(40)}
         |SELECT id AS media_id, w::INTEGER AS width, h::INTEGER AS height,
         |  len(p)::BIGINT AS n_pixels,
         |  md5(list_aggregate(list_transform(p, v -> printf('%02X', v)),
         |    'string_agg', '')) AS pixel_md5
         |FROM mpx ORDER BY media_id""".stripMargin,

    // Two-stage quantized ANN re-derivation: per-vector int8 quantization
    // (scale = list_max(|v|)/127, q = floor(v/scale + 0.5) — exact in
    // double on both engines), sequential-fold int dot (integer-valued
    // doubles: association-order-proof), (dot*scaleA)*scaleB approx
    // ranking to k*oversample=20, exact-cosine re-rank to k=5.
    // REAL-resize re-derivation: the 2D nearest-neighbor resample of the
    // formula raster — out(dy,dx) = p[((dy*h) div 8)*w + (dx*w) div 8].
    "mm_resize" ->
      s"""WITH ${mmPixelCtes(40)},
         |rs AS (
         |  SELECT id, list_transform(range(64),
         |    j -> p[CAST((((j // 8) * h) // 8) * w + (((j % 8) * w) // 8) + 1 AS BIGINT)]) AS rp
         |  FROM mpx)
         |SELECT id AS media_id, 8 AS width, 8 AS height, 64 AS n_bytes,
         |  md5(list_aggregate(list_transform(rp, v -> printf('%02X', v)),
         |    'string_agg', '')) AS payload_md5
         |FROM rs ORDER BY media_id""".stripMargin,

    // aHash-over-DECODED-rasters re-derivation: original / 16x8-thumbnail
    // / exact-copy pixel lists from the fixture formula, 64 block bytes
    // per raster, mean-threshold band bits as exact integer sums,
    // band-keyed candidate join, bit_count(xor) Hamming verify.
    "mm_phash_neardup" -> {
      def bandSql(k: Int) =
        (0 until 16).map(j =>
          s"(CASE WHEN 64*vals[${16 * k + j + 1}] > total THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ")
      s"""WITH ${mmPixelCtes(40)},
         |thumbs AS (
         |  SELECT id + 1000000 AS id, list_transform(range(128),
         |    j -> p[CAST((((j // 16) * h) // 8) * w + (((j % 16) * w) // 16) + 1 AS BIGINT)]) AS p
         |  FROM mpx),
         |copies AS (SELECT id + 2000000 AS id, p FROM mpx WHERE id < 10),
         |d AS (SELECT id, p FROM mpx UNION ALL SELECT id, p FROM thumbs
         |      UNION ALL SELECT id, p FROM copies),
         |v AS (
         |  SELECT id, list_transform(range(64),
         |    j -> p[CAST((j*len(p))//64 + 1 AS BIGINT)]) AS vals
         |  FROM d),
         |tt AS (SELECT id, vals,
         |  list_reduce(list_prepend(0::BIGINT, vals), (a,b) -> a+b) AS total FROM v),
         |sg AS (SELECT id,
         |  ${(0 until 4).map(k => s"(${bandSql(k)}) AS band_$k").mkString(",\n         |  ")}
         |  FROM tt),
         |bk AS (
         |  ${(0 until 4).map(k => s"SELECT id, $k AS band, band_$k AS bv FROM sg")
                .mkString("\n         |  UNION ALL ")}),
         |cand AS (
         |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
         |  FROM bk l JOIN bk r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id),
         |hm AS (
         |  SELECT id_a, id_b,
         |    (${(0 until 4).map(k => s"bit_count(xor(a.band_$k, b.band_$k))").mkString(" + ")})::BIGINT AS hamming
         |  FROM cand JOIN sg a ON a.id = id_a JOIN sg b ON b.id = id_b)
         |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    // Frame i of n (= max(1, duration//100), duration = 1 ms/byte) is the
    // 24-byte payload slice at byte offset (i*len)//n — re-derived as a
    // hex-string substring, md5-compared like mm_resize.
    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, hex(text::BLOB) AS h, octet_length(text::BLOB) AS len
        |  FROM documents),
        |f AS (SELECT doc_id, h, len, greatest(1, len // 100) AS n FROM d),
        |x AS (SELECT doc_id, h, len, n, unnest(range(n)) AS i FROM f)
        |SELECT doc_id AS media_id, i::INTEGER AS frame_idx,
        |  (i*100)::BIGINT AS ts_ms,
        |  least(24, len - (i*len)//n)::INTEGER AS n_bytes,
        |  md5(substring(h, CAST((i*len)//n AS BIGINT)*2+1,
        |    least(24, len - (i*len)//n)*2)) AS frame_md5
        |FROM x ORDER BY media_id, frame_idx""".stripMargin,

    // Expected table: deterministic IVF top-k (Lloyd cells use min-id init
    // and decimal-exact means; re-rank values are exact cosine). Pinned at
    // sf0.01 — the driver's correctness SF.
  )

  val rederiveSql: Map[String, String] = Map(
    "dq_chi_square" ->
      """WITH cells AS (
        |  SELECT source::VARCHAR AS r, lang::VARCHAR AS c, count(*)::BIGINT AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT r, sum(o)::BIGINT AS mrt FROM cells GROUP BY r),
        |ct AS (SELECT c, sum(o)::BIGINT AS mct FROM cells GROUP BY c),
        |nn AS (SELECT sum(mrt)::BIGINT AS n, count(*)::BIGINT AS nr FROM rt),
        |nc AS (SELECT count(*)::BIGINT AS ncl FROM ct),
        |we AS (
        |  SELECT cells.r, cells.c, cells.o,
        |    (rt.mrt * ct.mct)::DOUBLE / nn.n::DOUBLE AS e
        |  FROM cells
        |  JOIN rt ON rt.r IS NOT DISTINCT FROM cells.r
        |  JOIN ct ON ct.c IS NOT DISTINCT FROM cells.c
        |  CROSS JOIN nn),
        |wc AS (
        |  SELECT r, c, o,
        |    CAST(round(e * 1000000000.0::DOUBLE) AS BIGINT) AS e_n9,
        |    CAST(round((o - e) * (o - e) / e * 1000000000.0::DOUBLE) AS BIGINT) AS contrib_n9,
        |    CAST(round(o::DOUBLE * o::DOUBLE / e * 1000000000.0::DOUBLE) AS BIGINT) AS term_n9
        |  FROM we),
        |st AS (
        |  SELECT (sum(wc.term_n9) - nn.n * 1000000000)::BIGINT AS chi2_n9,
        |    ((nn.nr - 1) * (nc.ncl - 1))::BIGINT AS dof
        |  FROM wc CROSS JOIN nn CROSS JOIN nc GROUP BY nn.n, nn.nr, nc.ncl)
        |SELECT wc.r, wc.c, wc.o, wc.e_n9, wc.contrib_n9, st.chi2_n9, st.dof
        |FROM wc CROSS JOIN st ORDER BY r, c""".stripMargin,

    "dq_label_balance" ->
      """WITH cells AS (
        |  SELECT source::VARCHAR AS g, lang::VARCHAR AS l, count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT g, sum(c)::BIGINT AS n FROM cells GROUP BY g),
        |w AS (
        |  SELECT cells.g, cells.c, tot.n, cells.c::DOUBLE / tot.n::DOUBLE AS p
        |  FROM cells JOIN tot ON tot.g IS NOT DISTINCT FROM cells.g),
        |c2 AS (
        |  SELECT g, n,
        |    CAST(round((-p) * ln(p) * 1000000000.0::DOUBLE) AS BIGINT) AS h_n9,
        |    CAST(round(p * p * 1000000000.0::DOUBLE) AS BIGINT) AS g_n9
        |  FROM w)
        |SELECT g AS "group", min(n)::BIGINT AS n, count(*)::BIGINT AS n_labels,
        |  sum(h_n9)::BIGINT AS entropy_n9,
        |  (1000000000 - sum(g_n9))::BIGINT AS gini_n9
        |FROM c2 GROUP BY g ORDER BY "group"""".stripMargin,

    "e_windowed_drift_fx" ->
      """WITH ev(event_id, ts, event_type) AS (VALUES
        |  (1, '2024-01-01 00:05:00'::TIMESTAMP, 'a'),
        |  (2, '2024-01-01 00:10:00'::TIMESTAMP, 'a'),
        |  (3, '2024-01-01 00:20:00'::TIMESTAMP, 'b'),
        |  (4, '2024-01-01 01:05:00'::TIMESTAMP, 'b'),
        |  (5, '2024-01-01 01:10:00'::TIMESTAMP, 'b'),
        |  (6, '2024-01-01 01:20:00'::TIMESTAMP, 'zz')),
        |ref(category, ref_n) AS (VALUES ('a', 2::BIGINT), ('b', 1::BIGINT)),
        |rs AS (SELECT count(*)::BIGINT AS n_cats, sum(ref_n)::BIGINT AS ref_total FROM ref),
        |cnt AS (
        |  SELECT date_trunc('hour', ts) AS w,
        |    CASE WHEN event_type IN (SELECT category FROM ref)
        |         THEN event_type ELSE '<other>' END AS category,
        |    count(*)::BIGINT AS n
        |  FROM ev GROUP BY 1, 2),
        |wins AS (SELECT w, sum(n)::BIGINT AS n_w FROM cnt GROUP BY w),
        |space AS (
        |  SELECT category, ref_n FROM ref
        |  UNION ALL SELECT '<other>', 0::BIGINT),
        |grid AS (
        |  SELECT wins.w, wins.n_w, space.category, space.ref_n
        |  FROM wins CROSS JOIN space),
        |j AS (
        |  SELECT g.w, g.n_w, g.category, g.ref_n, coalesce(cnt.n, 0)::BIGINT AS n
        |  FROM grid g LEFT JOIN cnt ON cnt.w = g.w AND cnt.category = g.category),
        |c AS (
        |  SELECT w, category, n,
        |    CAST(round((((n + 1)::DOUBLE / (n_w + n_cats + 1)
        |        - (ref_n + 1)::DOUBLE / (ref_total + n_cats + 1))
        |      * ln(((n + 1)::DOUBLE / (n_w + n_cats + 1))
        |        / ((ref_n + 1)::DOUBLE / (ref_total + n_cats + 1))))
        |      * 1000000000.0::DOUBLE) AS BIGINT) AS contrib_n9
        |  FROM j CROSS JOIN rs),
        |p AS (SELECT w, sum(contrib_n9)::BIGINT AS psi_n9 FROM c GROUP BY w)
        |SELECT strftime(c.w, '%Y-%m-%d %H:%M:%S') AS window_start, c.category, c.n,
        |  c.contrib_n9, p.psi_n9
        |FROM c JOIN p USING (w) ORDER BY window_start, category""".stripMargin,

    "e_windowed_drift" ->
      """WITH ref AS (
        |  SELECT event_type::VARCHAR AS category, count(*)::BIGINT AS ref_n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |rs AS (SELECT count(*)::BIGINT AS n_cats, sum(ref_n)::BIGINT AS ref_total FROM ref),
        |cnt AS (
        |  SELECT date_trunc('hour', ts) AS w,
        |    CASE WHEN event_type IN (SELECT category FROM ref)
        |         THEN event_type::VARCHAR ELSE '<other>' END AS category,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |wins AS (SELECT w, sum(n)::BIGINT AS n_w FROM cnt GROUP BY w),
        |space AS (
        |  SELECT category, ref_n FROM ref
        |  UNION ALL SELECT '<other>', 0::BIGINT),
        |grid AS (
        |  SELECT wins.w, wins.n_w, space.category, space.ref_n
        |  FROM wins CROSS JOIN space),
        |j AS (
        |  SELECT g.w, g.n_w, g.category, g.ref_n, coalesce(cnt.n, 0)::BIGINT AS n
        |  FROM grid g LEFT JOIN cnt ON cnt.w = g.w AND cnt.category = g.category),
        |c AS (
        |  SELECT w, category, n,
        |    CAST(round((((n + 1)::DOUBLE / (n_w + n_cats + 1)
        |        - (ref_n + 1)::DOUBLE / (ref_total + n_cats + 1))
        |      * ln(((n + 1)::DOUBLE / (n_w + n_cats + 1))
        |        / ((ref_n + 1)::DOUBLE / (ref_total + n_cats + 1))))
        |      * 1000000000.0::DOUBLE) AS BIGINT) AS contrib_n9
        |  FROM j CROSS JOIN rs),
        |p AS (SELECT w, sum(contrib_n9)::BIGINT AS psi_n9 FROM c GROUP BY w)
        |SELECT strftime(c.w, '%Y-%m-%d %H:%M:%S') AS window_start, c.category, c.n,
        |  c.contrib_n9, p.psi_n9
        |FROM c JOIN p USING (w) ORDER BY window_start, category""".stripMargin,

    "e_stream_window_fx" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_str, event_type,
        |  count(*) AS n, sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        |FROM (VALUES
        |  (TIMESTAMP '2025-01-01 00:05:00', 'click', '1.25'::DOUBLE),
        |  (TIMESTAMP '2025-01-01 00:40:00', 'click', '2.5'::DOUBLE),
        |  (TIMESTAMP '2025-01-01 00:55:00', 'view', '0.75'::DOUBLE),
        |  (TIMESTAMP '2025-01-01 01:10:00', 'click', '3.25'::DOUBLE),
        |  (TIMESTAMP '2025-01-01 01:59:59', 'error', '1.0'::DOUBLE),
        |  (TIMESTAMP '2025-01-01 02:00:00', 'view', '4.5'::DOUBLE)) AS t(ts, event_type, value)
        |GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin,

    "e_session_window_fx" ->
      """WITH ev AS (
        |  SELECT user_id::BIGINT AS user_id, ts, value FROM (VALUES
        |    (1, TIMESTAMP '2025-01-01 00:00:00', '1.25'::DOUBLE),
        |    (1, TIMESTAMP '2025-01-01 00:10:00', '2.5'::DOUBLE),
        |    (1, TIMESTAMP '2025-01-01 01:00:00', '0.75'::DOUBLE),
        |    (2, TIMESTAMP '2025-01-01 00:05:00', '4.0'::DOUBLE)) AS t(user_id, ts, value)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), g AS (
        |  SELECT *, sum(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  user_id, count(*) AS n,
        |  sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

  )

}
