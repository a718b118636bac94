package graft

import graft.fdr.TargetDecoy
import graft.functions.{PeptideFunctions, TextFunctions, UsiFunctions}
import graft.operators.{Dedup, Similarity, SpectraCluster}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-surface registry (pipeline/io/joins/aggregations/windows/TPC-H) — one slice of the SURVEY.md §2 operator inventory,
  * split out of the single Queries registry in round 11 purely for
  * maintainability; keys, semantics, and oracles are unchanged and are
  * consumed only through [[Queries]]. Oracle-parity conventions are
  * documented on [[Queries]]. */
private[graft] object QueriesReference {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----------------------------------------------------------- aggregations
    // A1/A13 + pricing-summary flagship (conditional counts, exact sums).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"),
        )
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Composite multi-join analytics (optimizer stress: 3-way join with
    // pushed filters, decimal-exact revenue, deterministic top-10).
    "q3_multi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Q5-shape 6-table star join (round-10): region gate → nation →
    // customer/supplier co-nationality → orders window → lineitem
    // revenue, grouped by nation. The Catalyst showcase: all four dim
    // sides broadcast, the orders date filter pushes to the scan, and
    // the only shuffle is the final 5-row nation aggregate.
    "q5_region_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q18-shape large-volume-customer query (round-10): the HAVING-on-
    // aggregate semi-join pattern — lineitem rolls up per order FIRST
    // (map-side combined, the only corpus-wide shuffle), and only the
    // 204 qualifying orders ever touch the orders/customer joins (both
    // broadcast-able dims at any scale once the agg filter has run).
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 250L)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
    }),

    // Q8-shape market-share query (round-10): the dimension-role stress
    // test — nation joins TWICE in different roles (customer's nation
    // gates the ASIA region; supplier's nation is the market-share
    // numerator), with a conditional sum so numerator and denominator
    // come out of ONE aggregation pass. Exact integer cents end to end;
    // the share ships as BIGINT nanos (never DECIMAL, never a float
    // ratio recomputed oracle-side).
    "q8_market_share" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
      val custAsia = t(s, dir, "customer")
        .join(t(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custAsia, col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation").select(col("n_nationkey").as("_snk"),
          col("n_name").as("supp_nation")), col("s_nationkey") === col("_snk"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          cents.as("_c"), col("supp_nation"))
        .groupBy(col("o_year"))
        .agg(sum(col("_c")).as("total_cents"),
          sum(when(col("supp_nation") === "NATION_7", col("_c")).otherwise(lit(0L)))
            .as("nation_cents"))
        // the x1e9 product widens through DECIMAL(38,0) (long*long wraps
        // silently past ~9.2e9 cents); the div result is back in (0,1e9]
        .withColumn("share_n9", expr(
          "CAST((CAST(nation_cents AS DECIMAL(38,0)) * 1000000000) div total_cents AS BIGINT)"))
        .orderBy(col("o_year"))
    }),

    // Q10-shape returned-items ranking (round-10): which customers
    // returned the most revenue in a quarter — lineitem filters on
    // returnflag at the scan, aggregates per customer FIRST, and only
    // then meets the customer/nation dims; the top-20 cut rides a
    // TakeOrderedAndProject (no global sort materializes).
    "q10_returned_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // F2-F8 — predicate chain + projection, pushed to the parquet scan.
    "f_filter_chain" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1995-09-01").cast("timestamp"))
        .filter(col("l_quantity") >= 5 && col("l_quantity") <= 45)
        .filter(col("l_returnflag") =!= "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P3/P4/P5 — USI build + special-char cleaning + spectraUsi prefix.
    "p3_p5_usi" -> ((s, dir) => {
      val raw = concat(
        lit("mzspec:PXD000001:"), col("source"), lit("_"), col("lang"), lit(" ("),
        col("doc_id").cast("string"), lit("):scan:"), col("doc_id").cast("string"),
        lit(":PEPTIDE/2"))
      val usi = UsiFunctions.cleanUsi(raw)
      t(s, dir, "documents")
        .select(col("doc_id"), usi.as("usi"), UsiFunctions.spectraUsi(usi).as("spectra_usi"))
        .orderBy(col("doc_id"))
    }),

    // P7 — isobaric L->I normalization (translate).
    "p7_isobaric" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          UsiFunctions.isobaric(substring(col("text"), 1, 40)).as("iso_prefix"))
        .orderBy(col("doc_id"))
    }),

    // P9 — q==0 repair from the group-global positive minimum.
    "p9_qvalue_repair" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_discount").as("q")).distinct()
      TargetDecoy.repairZeroQValues(d, col("q"), Seq.empty, "q_repaired")
        .orderBy(col("q"))
    }),

    // P10 — missed-cleavage counting via regexp over sequence text.
    "p10_missed_cleavages" -> ((s, dir) => {
      val up = upper(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          (coalesce(regexp_count(up, lit("[KR]")), lit(0)) -
            coalesce(regexp_count(up, lit("[KR]P")), lit(0))).cast("long").as("mc"))
        .orderBy(col("doc_id"))
    }),

    // P12 — -log10 score transform, 5 dp.
    "p12_score_transform" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_discount").as("q")).filter(col("q") > 0).distinct()
        .select(col("q"), PeptideFunctions.proteinScore(col("q")).as("score"))
        .orderBy(col("q"))
    }),

    // ------------------------------------------------------------------ joins
    // J1 — normalize-then-equijoin (the PSM<->spectrum scan-key pattern).
    "j1_scan_key_join" -> ((s, dir) => {
      val withKey = t(s, dir, "orders")
        .withColumn("skey", concat(lit("scan="), col("o_orderkey").cast("string")))
      val norm = regexp_replace(col("skey"), "^scan=", "").cast("long")
      val li = t(s, dir, "lineitem")
      withKey
        .join(li, norm === li("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // J1 stage 2 — the unique-contains rescue
    // (JmzReaderSpectrumService.java:85-89) through the production
    // IndexPipeline.scanKeyJoin: even ids match the exact scan-token key,
    // odd ids are written WITHOUT a scan= token on the PSM side and
    // embedded inside a longer spectrum id — rescued only when exactly one
    // spectrum id contains them (frag1 is ambiguous inside frag11/frag13…,
    // frag499 is unique).
    "j1_contains_fallback" -> ((s, dir) => {
      import graft.functions.UsiFunctions
      val d = t(s, dir, "documents").select(col("doc_id")).filter(col("doc_id") < 500)
      val psmKeyed = d.select(
        col("doc_id").as("psmId"),
        when(col("doc_id") % 2 === 0,
          concat(lit("scan="), col("doc_id").cast("string")))
          .otherwise(concat(lit("frag"), col("doc_id").cast("string"))).as("sourceId"),
        lit("f1.mzML").as("fileName"),
        lit(UsiFunctions.IdFormat.MzmlId).as("idFormat"))
        .withColumn("scanKey",
          UsiFunctions.normalizeScanId(col("sourceId"), col("idFormat")))
      val spectraKeyed = d.select(
        lit("f1.mzML").as("fileName"),
        when(col("doc_id") % 2 === 0,
          concat(lit("controllerType=0 controllerNumber=1 scan="),
            col("doc_id").cast("string")))
          .otherwise(concat(lit("id_"), col("doc_id").cast("string"),
            lit("_frag"), col("doc_id").cast("string"))).as("scanId"),
        (col("doc_id") % 100 + 400).cast("double").as("precursor_mz"))
        .withColumn("scanKey", UsiFunctions.normalizeScanId(col("scanId"),
          lit(UsiFunctions.IdFormat.MzmlId)))
        .withColumn("spectrumFileType", lit("MZML"))
        .select("fileName", "scanKey", "scanId", "spectrumFileType", "precursor_mz")
      graft.pipeline.IndexPipeline.scanKeyJoin(psmKeyed, spectraKeyed)
        .select(col("psmId"), col("scanKey"), col("precursor_mz"))
        .orderBy(col("psmId"))
    }),

    // J2 — anti-join completeness guard (unmatched => error in the reference).
    "j2_unmatched_guard" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_unmatched"))
    }),

    // J3 — contains()-theta join over small broadcast dims.
    "j3_contains_join" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = broadcast(t(s, dir, "region"))
      n.join(r, n("n_name").contains(substring(r("r_name"), 1, 1)))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"), col("r_name"))
    }),

    // J5 — broadcast dimension lookup with coalesce fallback.
    "j5_dim_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"))
        .orderBy(col("c_custkey"))
    }),

    // J6 — left-semi membership filter.
    "j6_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey"))
      t(s, dir, "lineitem")
        .join(big, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // J7 + A3/A7/A9 — single groupBy assembling the per-key rollup
    // (the protein-evidence shape: counts, best score, dedup'd member list).
    "j7_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_orderpriority")).as("n_priorities"),
          min(col("o_totalprice")).as("best_price"),
          max((col("o_orderstatus") === "O").cast("int")).cast("boolean").as("any_open"),
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        )
        .orderBy(col("o_custkey"))
    }),

    // A5/A6 — peptide-uniqueness inference category over a bipartite graph.
    "a6_inference_category" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // pre-dedup (part, supp) then plain count+min: one partial-agg
      // pipeline, no Expand from mixing countDistinct with min
      val perPart = li.select(col("l_partkey"), col("l_suppkey")).distinct()
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("ns"), min(col("l_suppkey")).as("only_supp"))
      val unique = perPart.filter(col("ns") === 1)
        .select(col("only_supp").as("supp")).distinct().withColumn("u", lit(true))
      li.select(col("l_suppkey").as("supp")).distinct()
        .join(unique, Seq("supp"), "left")
        .select(col("supp"),
          when(col("u"), lit("distinguishable")).otherwise(lit("indistinguishable")).as("category"))
        .orderBy(col("supp"))
    }),

    // A11 — cluster purity: dominant member form must exceed the ratio gate.
    "a11_cluster_purity" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
      val wr = w.orderBy(col("cnt").desc, col("event_type").asc)
      counts
        .withColumn("total", sum(col("cnt")).over(w))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .withColumn("ratio", col("cnt").cast("double") / col("total"))
        .filter(col("ratio") > 0.22)
        .select(col("user_id"), col("event_type").as("dominant_type"), col("ratio"))
        .orderBy(col("user_id"))
    }),

    // A12/W1 — best-per-group representative via window rank.
    "a12_best_per_cluster" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id"))
    }),

    // A14/W2 — target-decoy FDR + q-values (running counts + reverse min).
    "a14_fdr_qvalues" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("assay", col("user_id") % 8)
        .withColumn("is_decoy", col("event_type") === "error")
      TargetDecoy
        .withQValues(ev, Seq(col("assay")), col("value"), col("is_decoy"), col("event_id"))
        .select(col("assay"), col("event_id"), col("is_decoy"), col("fdr"), col("q_value"))
        .orderBy(col("assay"), col("event_id"))
    }),

    // W4 — deterministic ordered collection (sorted member list per key).
    "w4_sorted_collect" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_list(
          concat_ws(":", col("event_type"), col("event_id")))), ",").as("members"))
        .orderBy(col("user_id"))
    }),

    // W3 — top-k identifications per spectrum (rank limit).
    "w3_top_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .select(col("user_id"), col("rank"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rank"))
    }),

    // W3 twin over an inline fixture: keeps the operator verified even if
    // the SF testdata regenerates incompatibly (round-6 lesson: all ten
    // events-table oracles vanished at once when the loader broke, leaving
    // W3 with zero green rows).
    "w3_top_rank_fx" -> ((s, _) => {
      import s.implicits._
      val ev = Seq(
        (1L, 1L, 0.5), (1L, 2L, 0.9), (1L, 3L, 0.9), (1L, 4L, 0.1),
        (2L, 5L, 1.0),
        (3L, 6L, 2.0), (3L, 7L, 3.0), (3L, 8L, 1.0),
      ).toDF("user_id", "event_id", "value")
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
      ev.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .select(col("user_id"), col("rank"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rank"))
    }),

    // W6 — trailing range-frame window (RANGE BETWEEN 1 HOUR PRECEDING):
    // per-user rolling event count + exact decimal rolling sum. The
    // running range frame evaluates streaming per partition — no
    // full-frame buffering; decimal sum keeps the rolling total
    // order-free for cross-engine parity.
    "w6_rolling_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            .as("sum_trailing_1h"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W3 aggregate tier: bounded top-k per group via the native
    // TopKByAgg — partial top-k map-side, only k pairs per (partition,
    // group) cross the shuffle (the window form sorts every row of
    // every group). Same result as the w3 row_number oracle.
    "w3_topk_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // register on the frame's OWNING session — the nanos-fallback
      // loader hands back a newSession() frame with its own registry
      ev.groupBy(col("event_type"))
        .agg(graft.functions.TopKByAgg
          .topKIds(ev.sparkSession, col("value"), col("event_id"), 3).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("col.ord").as("value"), col("col.id").as("event_id"))
        .orderBy(col("event_type"), col("rank"))
    }),

    // J8 — bucketed co-located join: both fact sides written bucketBy the
    // join key, so the SMJ reads bucket metadata instead of shuffling
    // either side (plan asserted exchange-free in BucketedSpec). The
    // 100 TB shape for every repeated big-to-big join.
    "j8_bucketed_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderstatus"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
      // reuseExisting: the ingest-time bucketing is paid once per
      // session; repeat runs measure the exchange-free join itself
      graft.operators.Bucketed.coLocatedJoin(s, o, l, "k", nBuckets = 8,
        tablePrefix = "graft_bkt_j8", reuseExisting = true)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // J9 — as-of join: each click picks up the latest purchase at or
    // before it per user (union + running-last window — ONE shuffle on
    // the key, no range self-join). The right side pre-aggregates per
    // (user, ts) so duplicate-timestamp survivor semantics are pinned —
    // which also keeps DuckDB's native ASOF JOIN oracle well-defined.
    "j9_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("value")).as("purchase_value"))
      graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", "pts")
        .orderBy(col("user_id"), col("event_id"))
    }),

    // J9b — the dimension-table form of the as-of join: per-key sorted
    // reference arrays + array-filter lookup (broadcast-able key join,
    // zero probe-side shuffle; composes with stream-static joins).
    // Identical semantics to j9 — same DuckDB ASOF oracle.
    "j9_asof_lookup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("value")).as("purchase_value"))
      graft.operators.AsOfJoin.asOfLookup(clicks, purchases, Seq("user_id"), "ts", "pts")
        .orderBy(col("user_id"), col("event_id"))
    }),

    // J11 — explicit Bloom semi-join reduction (round-12): lineitem rows
    // drop through a native might_contain(xxhash64) predicate built from
    // the urgent-orders key set BEFORE the join shuffle; the equi-join
    // then removes the fpp-bounded false positives, so the result is
    // row-identical to the plain join (the oracle states exactly that —
    // no bloom anywhere). Quantities are integral; the sum ships BIGINT.
    "j11_bloom_semi" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      graft.operators.BloomJoin
        .semiReducedJoin(li, urgent, Seq("l_orderkey"),
          expectedItems = 100000L, fpp = 0.03)
        .groupBy(col("l_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("l_orderkey"))
    }),

    // J10 — range join: clicks falling inside the 2-hour window after a
    // purchase by the same user. Binned to an equi-join on (user, hour
    // bucket of unix micros) + exact re-check — the inequality join never
    // runs as a nested loop. The DuckDB oracle states the predicate as a
    // plain inequality join, a semantically independent formulation.
    "j10_range_join" -> ((s, dir) => {
      // session TZ is pinned UTC, so the NTZ->instant cast is lossless
      val ev = t(s, dir, "events")
      val micros = (c: Column) => unix_micros(c.cast("timestamp"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), micros(col("ts")).as("cx"),
          col("ts").as("click_ts"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          micros(col("ts")).as("ws"),
          micros(col("ts") + expr("INTERVAL 2 HOURS")).as("we"))
      graft.operators.RangeJoin
        .pointInInterval(clicks, windows, Seq("user_id"), "cx", "ws", "we",
          binWidth = 3600L * 1000000L) // 1-hour bins ~ the typical span
        .select(col("user_id"), col("event_id"), col("click_ts"), col("purchase_ts"))
        .orderBy(col("user_id"), col("event_id"), col("purchase_ts"))
    }),

    // U1 — union of two sources, counted per key.
    "u1_union" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))
      c.unionByName(sup).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    }),

    // U3 — INTERSECT / EXCEPT (distinct set semantics both engines):
    // nations that have customers but no suppliers, and both.
    "u3_intersect_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))
      val both = c.intersect(sup).withColumn("relation", lit("both"))
      val onlyC = c.except(sup).withColumn("relation", lit("customers_only"))
      both.unionByName(onlyC).orderBy(col("relation"), col("nationkey"))
    }),

    // A16 — ROLLUP grouping-set aggregation: per-(flag, status) revenue
    // plus per-flag and grand totals in one pass (the grouping-id keeps
    // NULL category values distinct from subtotal rows).
    "a16_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // A18 — CUBE: the full 2^k grouping-set lattice (rollup's superset;
    // one scan, Catalyst expands the grouping sets map-side). Completes
    // the multi-dimensional aggregation surface next to a16/a17.
    "a18_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // A17 — PIVOT cross-tab: per-user-decile event counts by type, the
    // pinned-value-list form (fixed schema; Catalyst lowers it to a
    // two-level pivotfirst aggregation over ONE scan — no per-type
    // scans). The zero-fill is scoped to the count columns: an unscoped
    // fill would also rewrite a NULL decile key to 0.
    "a17_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("decile", (col("user_id") % 10).cast("int"))
        .groupBy(col("decile"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
        .orderBy(col("decile"))
    }),

    // W7 — the ranking/distribution window family in one query:
    // lead/lag/ntile/percent_rank/cume_dist per nation partition (exact
    // rational outputs; acctbal guaranteed distinct per partition is NOT
    // assumed — ties break on custkey in the window order).
    "w7_window_family" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .filter(col("c_nationkey") < 5)
        .select(col("c_nationkey").cast("int").as("nationkey"),
          col("c_custkey").as("custkey"),
          col("c_acctbal"),
          lag(col("c_custkey"), 1).over(w).as("prev_key"),
          lead(col("c_custkey"), 1).over(w).as("next_key"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("nationkey"), col("custkey"))
    }),

    // U2 — explode(split) token flattening + counts.
    "u2_explode_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    }),

    // D2 — duplicate-key detection (groupBy count > 1).
    "d2_dup_detect" -> ((s, dir) => {
      t(s, dir, "orders")
        .select((col("o_orderkey") % 97).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy(col("k"))
    }),

    // Salted two-phase aggregation (skew path) — must equal the plain
    // GROUP BY, which is exactly what the oracle checks.
    "a_salted_agg" -> ((s, dir) => {
      graft.operators.Skew.saltedAggregate(
        t(s, dir, "lineitem"),
        key = col("l_returnflag"),
        uniqueCol = concat_ws(":", col("l_orderkey"), col("l_linenumber")),
        saltBuckets = 8,
        partials = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("pq")),
        finals = Seq(sum(col("pn")).as("n"), sum(col("pq")).as("sum_qty")))
        .withColumnRenamed("_key", "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),

    // Salted replicated join (hot-key path) — must equal the plain join,
    // which is exactly what the oracle checks.
    "a_salted_join" -> ((s, dir) => {
      graft.operators.Skew.saltedJoin(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"), col("l_linenumber")),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        key = "l_orderkey",
        probeUnique = concat_ws(":", col("l_orderkey"), col("l_linenumber")),
        saltBuckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // W5 — distributed global row index (range-sort + zipWithIndex; the
    // J4 positional-contract primitive — no single-task Window.orderBy).
    "w5_global_index" -> ((s, dir) => {
      graft.operators.GlobalIndex.withGlobalIndex(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        Seq(col("doc_id")), "gidx")
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------- training-data operators
    // Exact dedup: md5 fingerprint, deterministic min-id survivor.
    "a_pearson_corr" -> ((s, dir) => {
      // r15: both correlation pairs in ONE lineitem scan/aggregation
      // (pearsonCorrPairs) instead of a union of two full-scan calls —
      // exact DECIMAL accumulators make the fusion value-identical.
      graft.operators.DataQuality.pearsonCorrPairs(t(s, dir, "lineitem"), Seq(
        ("qty_discount", floor(col("l_quantity")), floor(col("l_discount") * 100)),
        ("qty_price", floor(col("l_quantity")), floor(col("l_extendedprice")))))
        .orderBy(col("pair"))
    }),

    // Primary-key audits (round-9) across three tables — uniqueness/
    // nullability of the columns every join and dedup trusts; a
    // composite key audits through its canonical string form.
    "j_guarded_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy(col("user_id")).agg(min(col("event_type")).as("first_type"))
      graft.operators.Skew.fanoutGuardedJoin(
        ev.select(col("event_id"), col("user_id")), dim, "user_id", maxMatches = 1)
        .orderBy(col("event_id"))
    }),

    // CDC changelog apply (round-9): snapshot ⟵ change stream via the
    // per-key champion change (max version; I/U upsert, D delete) —
    // idempotent under replay, one aggregation + one full-outer join.
    "p11_rt_fallback" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")),
            nullif(col("o_orderpriority"), lit("1-URGENT")), lit("NONE")).as("resolved"))
        .orderBy(col("o_orderkey"))
    }),

    // P14 — content checksum as stable id (sha2 over the byte payload).
    "p14_checksum" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("sha256"))
        .orderBy(col("doc_id"))
    }),

    // D1 — distinct projection.
    "d1_distinct" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderpriority")).distinct()
        .orderBy(col("o_orderpriority"))
    }),

    // Token-count estimate (whitespace + punctuation-run BPE-ish proxy).
    "pipeline_native_cluster" -> ((s, dir) => {
      val spectra = syntheticClusterSpectra(s, dir)
      val v = col("index") % 1000L
      val g = (col("index") / lit(1000)).cast("long")
      val seq =
        when(v % 5 === 0, when(g === 1, "LEK").otherwise("PEK"))
          .when(v % 5 === 1, lit("PEK"))
          .when(v % 5 === 2, when(g === 1, "PEIK").otherwise("PELK"))
          .otherwise(lit("AAK"))
      val form =
        when(v % 5 === 1,
          when(g === 1, "PE[UNIMOD:35]K/2").when(g === 2, "PEK/3").otherwise("PEK/2"))
          .otherwise(concat(seq, lit("/2")))
      val psms = spectra.select(col("specId").as("index"))
        .select(
          col("index"),
          concat(lit("u"), col("index").cast("string")).as("usi"),
          seq.as("peptideSequence"),
          form.as("peptidoform"),
          lit(false).as("isDecoy"),
          (((v * 7 + g * 3) % 100).cast("double") / lit(100.0)).as("score"))
      val mapping = spectra.select(
        lit("native.mgf").as("file"), col("specId").as("spectrumIndex"), col("specId"))
      val mara = SpectraCluster.asMaraClusterRows(
        mapping, SpectraCluster.clusterSpectra(spectra, nativeClusterConfig))
      val out = graft.pipeline.ClusterInference.run(psms, mara)
      out.representatives
        .select(lit("rep").as("kind"), col("clusterId").cast("long").as("cluster_id"),
          col("usi").as("detail"))
        .unionByName(out.removed
          .select(lit("removed").as("kind"), col("clusterId").cast("long").as("cluster_id"),
            col("reason").as("detail")))
        .orderBy(col("kind"), col("cluster_id"))
    }),

    // Typed KeyValueGroupedDataset rollup (the custom-state template shape,
    // SURVEY §1.4 Dataset[T] at API boundaries): per-user event count and
    // exact cent total via mapGroups — order-free longs, so oracle-equal.
    "p_string_family" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(upper(substring(col("source"), 1, 1)), substring(col("source"), 2, 100))
            .as("capitalized"),
          col("text").contains("spark").as("has_spark"),
          col("source").startsWith("src1").as("is_src1"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_vowels"),
          format_string("%s|%04d", col("lang"), col("doc_id")).as("formatted"),
        )
        .orderBy(col("doc_id"))
    }),

    // §2.6 json — from_json struct extraction over the events props column.
    "f13_scanid_validity" -> ((s, dir) => {
      val sid = when(col("doc_id") % 10 === 0,
        concat(lit("sample=1 period=1 cycle=1 experiment="), col("doc_id").cast("string")))
        .when(col("doc_id") % 7 === 0, concat(lit("scan"), col("doc_id").cast("string")))
        .otherwise(col("doc_id").cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), sid.as("scan_id"),
          graft.functions.ParamFunctions.isValidScanId(sid).as("is_valid"))
        .orderBy(col("doc_id"))
    }),

    // F14 — score-array filtering projection (higher-order filter over
    // param structs with exclusion lists), exploded flat for comparison.
    "f14_score_filter" -> ((s, dir) => {
      val params = array(
        struct(lit("MS:1001155").as("accession"), lit("score").as("name"),
          col("l_discount").cast("string").as("value")),
        struct(lit("MS:1002355").as("accession"), lit("qvalue").as("name"),
          lit("0.01").as("value")),
        struct(lit("MS:1001171").as("accession"), lit("mascot").as("name"),
          when(col("l_quantity") > 25, col("l_quantity").cast("string")).as("value")),
      )
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(graft.functions.ParamFunctions.filterScores(params)).as("p"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("p.accession").as("accession"), col("p.value").as("value"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("accession"))
    }),

    // S8 — pipeline-glue ftp->https rewrite.
    "s8_ftp_rewrite" -> ((s, dir) => {
      val url = concat(lit("ftp://ftp.host.org/"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit(".mgf"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.ParamFunctions.ftpToHttps(url).as("https_url"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------ proteomics pipeline demos
    // Rows-only checks (no SQL oracle): the deterministic micro-assay runs
    // the real generate-index-files / perform-inference DAGs end-to-end.
    // Their exact semantics are pinned by the ScalaTest golden assertions.
    "pipeline_index_spectra" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.runIndex(s).archiveSpectra.orderBy(col("usi")))),
    "pipeline_index_proteins" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.runIndex(s).proteinEvidence
        .orderBy(col("reportedAccession")))),
    // PIA protein-FDR parity variant (PIAModelerService.java:80-101):
    // proteins scored and calibrated off the PSM-level FDR score (the
    // Combined-FDR-Score family) of the best PSM per peptide. The demo's
    // accepted PSM q-values all tie while their FDR scores differ, so the
    // reported score properties change per protein — flipping
    // `proteinScoreFromPsmFdrScore` off breaks this query's hash.
    "pipeline_proteins_combined_fdr" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.combinedFdrProteinIndex(s).proteinEvidence
        .orderBy(col("reportedAccession")))),
    // F9/F10 — the assay validity counters (unfiltered PSM/decoy counts +
    // post-join delta-mass error counters) as a driver-pinned row.
    "pipeline_validity" -> ((s, _) => {
      val idx = graft.pipeline.DemoAssay.runIndex(s)
      idx.validity
    }),

    // F8 + F11 — gate-differentiating assay variant, PIA unique-peptide
    // semantics (NR_UNIQUE_PEPTIDES_PER_PROTEIN_FILTER): uniquePeptides = 1
    // keeps sp|P4 (its peptide is unique to it) but drops sp|P5/sp|P6 —
    // 2 distinct peptides each, all shared, 0 unique. Restoring the old
    // distinct-count gate (or flipping F11 off) changes this row set.
    "pipeline_filter_gates" -> ((s, _) => {
      val out = graft.pipeline.DemoAssay.filterGateIndex(s)
      out.archiveSpectra
        .select(lit("spectrum").as("kind"), col("usi").as("id"))
        .unionByName(out.proteinEvidence
          .select(lit("protein").as("kind"), col("reportedAccession").as("id")))
        .orderBy(col("kind"), col("id"))
    }),

    // Picked protein FDR (published target/decoy pair competition): the
    // paired decoy DECOY_sp|P1 survives the loose q gates but loses the
    // pair competition to sp|P1 and is absent here — flipping
    // `pickedProteinFdr` off restores it and changes the row set.
    "pipeline_picked_fdr" -> ((s, _) =>
      graft.pipeline.DemoAssay.pickedFdrIndex(s).proteinEvidence
        .select(col("reportedAccession"), col("isDecoy"),
          col("numberPeptides"), col("numberPSMs"))
        .orderBy(col("reportedAccession"))),

    // Multi-result-file assay (PIAModelerService.java:191-219): the same
    // spectrum (index=1) identified in BOTH mzids as the same peptide
    // collapses to one PSM set before FDR (createPSMSets) — scalar
    // identity from the best-scoring member, protein accessions the UNION
    // of every member's evidence (sp|Q5 is attested ONLY by the losing
    // a.mzid and must survive); a rank-2 identification whose psmId sorts
    // first is swallowed by the setAllTopIdentifications(1) gate, and
    // q-values (string-pinned below) calibrate over the merged set —
    // removing any behavior changes this row set or its q denominators.
    "pipeline_multifile" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.multiFileIndex(s).archiveSpectra
        .select(col("usi"), col("peptideSequence"), col("isDecoy"),
          col("proteinAccessions"),
          col("bestSearchEngineScore").getField("value").as("q_value"))
        .orderBy(col("usi")))),

    // PRIDE XML e2e: the full generate-index-files DAG over ONE
    // self-contained legacy result file (identifications + mzData spectra).
    // Pins: spectrum-precursor charge resolution (PSM 1 has no charge
    // cvParam -> /2 from its spectrum), the shared-peptide PSM-set
    // collapse (index:2 carries BOTH accessions), the PRIDE:0000303 decoy
    // entering the FDR, and the index-type USI off the raw spectrum id.
    "pipeline_pridexml" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.prideXmlIndex(s).archiveSpectra
        .select(col("usi"), col("peptideSequence"), col("peptidoform"),
          col("isDecoy"), col("precursorCharge"), col("proteinAccessions"),
          col("bestSearchEngineScore").getField("value").as("q_value"))
        .orderBy(col("usi")))),

    "pipeline_cluster_inference" -> ((s, _) => {
      val out = graft.pipeline.ClusterInference.run(
        graft.pipeline.DemoAssay.clusterSpectra(s), graft.pipeline.DemoAssay.clusters(s))
      out.representatives.orderBy(col("clusterId"))
    }),
    // Combined FDR Score across two search engines (Jones et al. method;
    // rows-only — the interpolation + grouped calibration is pinned by
    // CombinedFdrSpec). Events stand in as two "engines" scoring shared
    // identifications.
    "fdr_combined_score" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(
          when(col("event_id") % 2 === 0, "engineA").otherwise("engineB").as("engine"),
          concat(lit("spec"), (col("event_id") / 4).cast("long").cast("string")).as("spectrum"),
          concat(lit("PEP"), (col("event_id") / 4).cast("long").cast("string")).as("peptide"),
          col("value").as("score"),
          (col("event_type") === "error").as("decoy"),
          col("event_id").cast("string").as("psmId"))
      jsonSafe(graft.fdr.CombinedFdr.combinedQValues(
        ev, col("engine"), Seq(col("spectrum"), col("peptide")),
        col("score"), col("decoy"), col("psmId"))
        .orderBy(col("spectrum"), col("peptide")))
    }),

    "fdr_protein_occam" -> ((s, _) => {
      import s.implicits._
      val pairs = Seq(
        ("x", "pepA", "P1"), ("x", "pepB", "P1"), ("x", "pepA", "P2"),
        ("x", "pepB", "P2"), ("x", "pepA", "P3"), ("x", "pepC", "P4"),
      ).toDF("assay", "peptide", "protein")
      graft.fdr.ProteinInference.occamsRazor(pairs).orderBy(col("accession"))
    }),
    "io_mgf_roundtrip" -> ((s, _) =>
      // fileName is the Spark part-file name (nondeterministic UUID) —
      // dropped so the expected-table oracle can pin the row values.
      jsonSafe(graft.pipeline.DemoAssay.mgfRoundTrip(s).drop("fileName")
        .orderBy(col("index")))),
    "io_mztab_scan" -> ((s, _) =>
      jsonSafe(graft.pipeline.DemoAssay.mzTabDemo(s).orderBy(col("psmId")))),

    // K1/K2 + S5 + F12 — archive JSON-lines roundtrip: the demo assay's
    // spectra through the partitioned sink (batch = usi field 3), read
    // back schema-locked, re-validated (F12 structural gate). Every
    // surviving value is oracle-pinned.
    "io_archive_json_roundtrip" -> ((s, _) => {
      val out = demoTempDir(s, "json")
      // NOTE: no unpersist here — runIndex is session-memoized and shared
      // by the other pipeline queries; entry points release it on exit.
      val idx = graft.pipeline.DemoAssay.runIndex(s)
      graft.io.ArchiveJson.writePartitioned(idx.archiveSpectra, s"$out/spectra")
      val back = graft.io.ArchiveJson.validate(
        graft.io.ArchiveJson.readPartitioned(s, s"$out/spectra"))
      jsonSafe(back.select(col("usi"), col("batch"), col("peptideSequence"),
        col("peptidoform"), col("isDecoy"), col("isValid"), col("precursorMz"),
        col("precursorCharge"), col("numPeaks"), col("missedCleavages"),
        col("proteinAccessions"), col("masses"), col("intensities"))
        .orderBy(col("usi")))
    }),

    // S2 complete: one fixture file per reference spectra FileType
    // (MGF/PKL/mzML/mzXML/MS2/DTA/APL/PRIDE XML), unioned by the same
    // readSpectraDir the CLI uses; every parsed value is oracle-pinned.
    "io_spectra_formats" -> ((s, _) =>
      jsonSafe(graft.pipeline.Commands.readSpectraDir(
        s, graft.pipeline.DemoFixtures.spectraFormatsDir())
        .withColumn("n_peaks", size(col("masses")))
        .select(col("fileName"), col("fileType"), col("index"), col("scanId"),
          col("title"), col("msLevel"), col("precursorMz"), col("precursorCharge"),
          col("retentionTime"), col("n_peaks"), col("masses"), col("intensities"))
        .orderBy(col("fileName"), col("index")))),

    // S1 — mzIdentML scan: PSMs joined to their SpectraData declaration
    // (score selection, positioned mods, decoy evidence, id formats).
    "io_mzid_scan" -> ((s, _) => {
      val path = graft.pipeline.DemoFixtures.mzidFile()
      val psms = graft.io.MzIdentMlIO.readPsms(s, Seq(path))
      val sd = graft.io.MzIdentMlIO.readSpectraData(s, Seq(path))
        .withColumnRenamed("file", "sdFile")
      jsonSafe(psms
        .join(broadcast(sd),
          psms("spectraDataRef") === sd("spectraDataId") && psms("file") === sd("sdFile"))
        .select(col("psmId"), col("peptideSequence"), col("proteinAccession"),
          col("isDecoy"), col("score"), col("rank"), col("charge"),
          col("expMassToCharge"), col("calcMassToCharge"), col("modifications"),
          col("sourceId"), col("location"), col("idFormatAccession"))
        .orderBy(col("psmId"), col("proteinAccession")))
    }),

    // S1 (legacy) — PRIDE XML identification scan: GelFreeIdentification /
    // TwoDimensionalIdentification sections to the standardized PSM shape.
    // Pins: the shared peptide under two accessions collapsing to ONE
    // content-derived psmId, the positioned PSI-MOD modification, the
    // PeptideItem score/charge cvParams, the Identification-<Score>
    // fallback, and the PRIDE:0000303 decoy-hit flag.
    "io_pridexml_ident" -> ((s, _) =>
      jsonSafe(graft.io.PrideXmlIO.readIdentifications(
        s, Seq(graft.pipeline.DemoFixtures.prideXmlIdentFile()))
        .select(col("psmId"), col("peptideSequence"), col("proteinAccession"),
          col("database"), col("isDecoy"), col("score"), col("charge"),
          col("expMassToCharge"), col("modifications"), col("sourceId"),
          col("start"), col("end"))
        .orderBy(col("psmId"), col("proteinAccession")))),

    // S3/S4 + F1/F2 + S8 — REST files catalog on a recorded payload:
    // generated-artifact drop, RESULT-category gate, compressed-name
    // normalization, ftp->https rewrite.
    "io_rest_catalog" -> ((s, _) => {
      val rest = new graft.io.PrideRest(
        fetch = _ => graft.pipeline.DemoFixtures.restFilesJson)
      rest.files(s, "PXDDEMO")
        .select(
          col("accession"),
          col("fileName"),
          col("fileCategory.accession").as("category_accession"),
          col("fileCategory.value").as("category"),
          graft.io.PrideRest.isResultFile.as("is_result"),
          regexp_replace(col("fileName"), "\\.(gz|zip)$", "").as("uncompressed_name"),
          col("fileName").rlike("\\.(gz|zip)$").as("was_compressed"),
          graft.functions.ParamFunctions.ftpToHttps(col("ftp")).as("https_url"))
        .orderBy(col("accession"))
    }),

    // S7 — SDRF scan: characteristics melt + plan-time EFO accession
    // resolution (unknown names carry NULL like the reference).
    "io_sdrf_melt" -> ((s, _) =>
      graft.io.SideInputs.readSdrf(s, graft.pipeline.DemoFixtures.sdrfFile())
        .orderBy(col("fileKey"), col("name"))),

    // K4 — result-file TSV sink roundtrip: write the tab-separated catalog,
    // read it back as text columns (values survive the sink bit-for-bit).
    "io_tsv_roundtrip" -> ((s, _) => {
      val rest = new graft.io.PrideRest(
        fetch = _ => graft.pipeline.DemoFixtures.restFilesJson)
      val out = demoTempDir(s, "tsv") + "/result_files"
      graft.io.PrideRest.writeResultFilesTsv(rest.files(s, "PXDDEMO"), out)
      s.read.option("sep", "\t").option("header", "true").csv(out)
        .orderBy(col("accession"))
    }),

    // Gzip JSON-lines roundtrip (round-9): events written as .json.gz
    // (the shape crawl logs actually arrive in) and read back through
    // Spark's transparent codec path must equal the parquet original.
    "io_jsonl_gzip" -> ((s, dir) => {
      val out = demoTempDir(s, "jsgz") + "/events_jsonl_gz"
      Tables(s, dir, "events")
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("compression", "gzip").json(out)
      s.read
        .schema("event_id LONG, ts_str STRING, user_id LONG, event_type STRING, value DOUBLE")
        .json(out)
        .orderBy(col("event_id"))
    }),

    // ORC sink + scan roundtrip (round-9): the events table written
    // through Spark's native ORC writer and read back must be value-
    // identical to the parquet original (the oracle reads the parquet) —
    // columnar-format portability for consumers standardized on ORC.
    "io_orc_roundtrip" -> ((s, dir) => {
      val out = demoTempDir(s, "orc") + "/events_orc"
      Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // Seasonal anomaly baseline (round-9): groupAdvantage composed over a
    // derived (event_type, hour-of-day) season key — each event's value
    // in sigma units of ITS seasonal slot; the operator doubles as the
    // seasonal-baseline anomaly scorer unchanged.
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
        |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS sum_disc_price,
        |  count(*) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_multi_join" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))::DOUBLE
        |    AS revenue
        |FROM lineitem, orders, customer, nation
        |WHERE l_returnflag = 'R' AND o_orderkey = l_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // Market-share re-derivation: identical IEEE cents quantization,
    // HUGEINT-wide share product cast back to BIGINT.
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  sum(floor(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
        |    AS total_cents,
        |  sum(CASE WHEN sn.n_name = 'NATION_7'
        |      THEN floor(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT
        |      ELSE 0 END)::BIGINT AS nation_cents,
        |  ((sum(CASE WHEN sn.n_name = 'NATION_7'
        |       THEN floor(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT
        |       ELSE 0 END) * 1000000000)
        |   // sum(floor(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT))::BIGINT
        |    AS share_n9
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    // Integral quantities: BIGINT-exact sum on both engines (DuckDB's
    // rounding double->BIGINT cast equals Spark's truncation on whole
    // numbers); HUGEINT sum cast back per the physical-type rule.
    "q18_large_orders" ->
      """SELECT c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_totalprice, total_qty::BIGINT AS total_qty
        |FROM customer, orders,
        |  (SELECT l_orderkey, sum(l_quantity::BIGINT) AS total_qty
        |   FROM lineitem GROUP BY 1
        |   HAVING sum(l_quantity::BIGINT) > 250) t
        |WHERE o_orderkey = t.l_orderkey AND c_custkey = o_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,

    "f_filter_chain" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-09-01'
        |  AND l_quantity >= 5 AND l_quantity <= 45 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p3_p5_usi" ->
      s"""WITH r AS (
         |  SELECT doc_id, 'mzspec:PXD000001:' || source || '_' || lang || ' (' ||
         |    doc_id::VARCHAR || '):scan:' || doc_id::VARCHAR || ':PEPTIDE/2' AS raw
         |  FROM documents),
         |c AS (SELECT doc_id, regexp_replace(raw, '$usiCharClass', '', 'g') AS usi FROM r)
         |SELECT doc_id, usi,
         |  array_to_string(string_split(usi, ':')[1:5], ':') AS spectra_usi
         |FROM c ORDER BY doc_id""".stripMargin,

    "p7_isobaric" ->
      """SELECT doc_id, translate(substr(text, 1, 40), 'L', 'I') AS iso_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p9_qvalue_repair" ->
      """WITH d AS (SELECT DISTINCT l_discount AS q FROM lineitem)
        |SELECT q, CASE WHEN q > 0 THEN q
        |  ELSE round((SELECT min(q) FROM d WHERE q > 0) / 10, 6) END AS q_repaired
        |FROM d ORDER BY q""".stripMargin,

    "p10_missed_cleavages" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(upper(text), '[KR]')) - len(regexp_extract_all(upper(text), '[KR]P')) AS mc
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p12_score_transform" ->
      """SELECT q, round(-log10(q), 5) AS score
        |FROM (SELECT DISTINCT l_discount AS q FROM lineitem WHERE l_discount > 0)
        |ORDER BY q""".stripMargin,

    "j1_scan_key_join" ->
      """WITH o AS (SELECT *, 'scan=' || o_orderkey::VARCHAR AS skey FROM orders)
        |SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM o JOIN lineitem ON CAST(regexp_replace(skey, '^scan=', '') AS BIGINT) = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j1_contains_fallback" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 500),
        |psmk AS (
        |  SELECT doc_id AS psmId,
        |    CASE WHEN doc_id % 2 = 0 THEN 'scan=' || CAST(doc_id AS VARCHAR)
        |         ELSE 'frag' || CAST(doc_id AS VARCHAR) END AS sourceId,
        |    CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR)
        |         ELSE 'frag' || CAST(doc_id AS VARCHAR) END AS scanKey
        |  FROM d),
        |speck AS (
        |  SELECT
        |    CASE WHEN doc_id % 2 = 0 THEN 'controllerType=0 controllerNumber=1 scan=' || CAST(doc_id AS VARCHAR)
        |         ELSE 'id_' || CAST(doc_id AS VARCHAR) || '_frag' || CAST(doc_id AS VARCHAR) END AS scanId,
        |    CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR)
        |         ELSE 'id_' || CAST(doc_id AS VARCHAR) || '_frag' || CAST(doc_id AS VARCHAR) END AS scanKey,
        |    CAST(doc_id % 100 + 400 AS DOUBLE) AS precursor_mz
        |  FROM d),
        |exact AS (
        |  SELECT p.psmId, p.scanKey, s.precursor_mz
        |  FROM psmk p JOIN speck s ON p.scanKey = s.scanKey),
        |unmatched AS (
        |  SELECT p.*,
        |    CASE WHEN starts_with(p.sourceId, 'scan=') THEN replace(p.sourceId, 'scan=', '')
        |         ELSE p.sourceId END AS strippedId
        |  FROM psmk p WHERE NOT EXISTS (SELECT 1 FROM speck s WHERE s.scanKey = p.scanKey)),
        |lkp AS (SELECT DISTINCT strippedId FROM unmatched),
        |hits AS (
        |  SELECT l.strippedId, s.precursor_mz
        |  FROM lkp l JOIN speck s ON contains(s.scanId, l.strippedId)),
        |uniq AS (
        |  SELECT strippedId, max(precursor_mz) AS precursor_mz
        |  FROM hits GROUP BY strippedId HAVING count(*) = 1),
        |rescued AS (
        |  SELECT u.psmId, u.scanKey, q.precursor_mz
        |  FROM unmatched u JOIN uniq q USING (strippedId))
        |SELECT psmId, scanKey, precursor_mz FROM exact
        |UNION ALL SELECT psmId, scanKey, precursor_mz FROM rescued
        |ORDER BY psmId""".stripMargin,

    "j2_unmatched_guard" ->
      """SELECT count(*) AS n_unmatched FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "j3_contains_join" ->
      """SELECT n_name, r_name FROM nation, region
        |WHERE contains(n_name, substr(r_name, 1, 1))
        |ORDER BY n_name, r_name""".stripMargin,

    "j5_dim_lookup" ->
      """SELECT c_custkey, coalesce(n_name, 'UNKNOWN') AS nation_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "j6_semi_join" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "j7_rollup" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  min(o_totalprice) AS best_price,
        |  max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 1 AS any_open,
        |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "a6_inference_category" ->
      """WITH per_part AS (
        |  SELECT l_partkey, count(DISTINCT l_suppkey) AS ns, min(l_suppkey) AS only_supp
        |  FROM lineitem GROUP BY l_partkey),
        |uq AS (SELECT DISTINCT only_supp AS supp FROM per_part WHERE ns = 1)
        |SELECT s.supp, CASE WHEN uq.supp IS NOT NULL THEN 'distinguishable'
        |  ELSE 'indistinguishable' END AS category
        |FROM (SELECT DISTINCT l_suppkey AS supp FROM lineitem) s
        |LEFT JOIN uq ON s.supp = uq.supp
        |ORDER BY s.supp""".stripMargin,

    "a11_cluster_purity" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY user_id, event_type),
        |ranked AS (
        |  SELECT user_id, event_type, cnt,
        |    sum(cnt) OVER (PARTITION BY user_id) AS total,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        |  FROM counts)
        |SELECT user_id, event_type AS dominant_type, cnt::DOUBLE / total AS ratio
        |FROM ranked WHERE rn = 1 AND cnt::DOUBLE / total > 0.22
        |ORDER BY user_id""".stripMargin,

    "a12_best_per_cluster" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "a14_fdr_qvalues" ->
      """WITH base AS (
        |  SELECT user_id % 8 AS assay, event_id, event_type = 'error' AS is_decoy, value
        |  FROM events),
        |cum AS (
        |  SELECT *,
        |    sum(CASE WHEN is_decoy THEN 1 ELSE 0 END) OVER wb AS cum_decoys,
        |    sum(CASE WHEN is_decoy THEN 0 ELSE 1 END) OVER wb AS cum_targets
        |  FROM base
        |  WINDOW wb AS (PARTITION BY assay ORDER BY value DESC, event_id ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (
        |  SELECT *, cum_decoys::DOUBLE / greatest(cum_targets, 1) AS fdr FROM cum)
        |SELECT assay, event_id, is_decoy, fdr,
        |  min(fdr) OVER (PARTITION BY assay ORDER BY value ASC, event_id DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_value
        |FROM f ORDER BY assay, event_id""".stripMargin,

    "w4_sorted_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(event_type || ':' || event_id::VARCHAR)), ',') AS members
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w3_top_rank" ->
      """SELECT user_id, rank, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events) WHERE rank <= 2 ORDER BY user_id, rank""".stripMargin,

    "w3_top_rank_fx" -> PinnedOracles.sql("w3_top_rank_fx"),

    "w3_topk_agg" ->
      """SELECT event_type, rank, value, event_id FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

    "w6_rolling_range" ->
      """SELECT user_id, event_id, ts,
        |  count(*) OVER w AS n_trailing_1h,
        |  (sum(CAST(value AS DECIMAL(18,2))) OVER w)::DOUBLE AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "j8_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "j9_asof_join" ->
      """WITH l AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
        |     r AS (SELECT user_id, ts AS pts, max(value) AS purchase_value FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.user_id, l.event_id, l.ts, l.value, r.pts, r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.pts
        |ORDER BY l.user_id, l.event_id""".stripMargin,

    "j9_asof_lookup" ->
      """WITH l AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
        |     r AS (SELECT user_id, ts AS pts, max(value) AS purchase_value FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.user_id, l.event_id, l.ts, l.value, r.pts, r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.pts
        |ORDER BY l.user_id, l.event_id""".stripMargin,

    // Bloom semi-join re-derivation: the PLAIN join — false positives
    // die at the equi-join, false negatives are impossible, so the
    // filter must be output-invisible.
    "j11_bloom_semi" ->
      """SELECT l.l_orderkey, o.o_custkey,
        |  count(*)::BIGINT AS n_items,
        |  sum(CAST(l.l_quantity AS BIGINT))::BIGINT AS sum_qty
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l.l_orderkey, o.o_custkey
        |ORDER BY l.l_orderkey""".stripMargin,

    "j10_range_join" ->
      """SELECT c.user_id, c.event_id, c.ts AS click_ts, p.ts AS purchase_ts
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 2 HOUR
        |ORDER BY c.user_id, c.event_id, p.ts""".stripMargin,

    "u1_union" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "u3_intersect_except" ->
      """SELECT nationkey, relation FROM (
        |  SELECT nationkey, 'both' AS relation FROM (
        |    SELECT c_nationkey::INT AS nationkey FROM customer
        |    INTERSECT SELECT s_nationkey::INT FROM supplier)
        |  UNION ALL
        |  SELECT nationkey, 'customers_only' FROM (
        |    SELECT c_nationkey::INT AS nationkey FROM customer
        |    EXCEPT SELECT s_nationkey::INT FROM supplier))
        |ORDER BY relation, nationkey""".stripMargin,

    // ROLLUP: grouping_id re-derived as GROUPING(first)*2 + GROUPING(second)
    // (Spark's bit order: first grouping column is most significant).
    "a16_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_price,
        |  (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::BIGINT AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "a18_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_price,
        |  (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::BIGINT AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    // PIVOT: conditional-count rendering (the same plan Catalyst lowers
    // the pivot to); absent combinations are 0 via the na.fill.
    "a17_pivot" ->
      """SELECT (user_id % 10)::INT AS decile,
        |  count(*) FILTER (WHERE event_type = 'click')::BIGINT AS click,
        |  count(*) FILTER (WHERE event_type = 'view')::BIGINT AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS signup,
        |  count(*) FILTER (WHERE event_type = 'error')::BIGINT AS error
        |FROM events GROUP BY 1 ORDER BY decile""".stripMargin,

    // Window family: identical full ordering (acctbal, custkey) makes
    // every peer group a single row — percent_rank/cume_dist are the
    // same exact rationals on both engines.
    "w7_window_family" ->
      """SELECT c_nationkey::INT AS nationkey, c_custkey AS custkey, c_acctbal,
        |  lag(c_custkey) OVER w AS prev_key, lead(c_custkey) OVER w AS next_key,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM customer WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY nationkey, custkey""".stripMargin,

    "u2_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents WHERE doc_id < 50)
        |WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin,

    "d2_dup_detect" ->
      """SELECT o_orderkey % 97 AS k, count(*) AS cnt FROM orders
        |GROUP BY o_orderkey % 97 HAVING count(*) > 1 ORDER BY k""".stripMargin,

    "a_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The salted replicated join must be observationally a plain join.
    "a_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "w5_global_index" ->
      """SELECT doc_id, lang, row_number() OVER (ORDER BY doc_id) - 1 AS gidx
        |FROM documents ORDER BY doc_id""".stripMargin,

    "io_jsonl_gzip" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // ORC roundtrip oracle: plain parquet read — equality proves the ORC
    // write+read preserved every value (ts rendered at second precision
    // on both engines).
    "io_orc_roundtrip" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // Seasonal-baseline re-derivation: the tdp_group_advantage algebra
    // keyed by the derived season string.
    "a_pearson_corr" ->
      """WITH b1 AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
        |         CAST(floor(l_discount * 100) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |b2 AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a1 AS (
        |  SELECT 'qty_discount' AS pair, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
        |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
        |    sum(x * y)::BIGINT AS sum_xy
        |  FROM b1),
        |a2 AS (
        |  SELECT 'qty_price' AS pair, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
        |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
        |    sum(x * y)::BIGINT AS sum_xy
        |  FROM b2),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |SELECT pair, n, sum_x, sum_y, sum_xy,
        |  CASE WHEN n::DOUBLE * sxx::DOUBLE - sum_x::DOUBLE * sum_x::DOUBLE > 0.0
        |        AND n::DOUBLE * syy::DOUBLE - sum_y::DOUBLE * sum_y::DOUBLE > 0.0
        |       THEN (n::DOUBLE * sum_xy::DOUBLE - sum_x::DOUBLE * sum_y::DOUBLE)
        |         / (sqrt(n::DOUBLE * sxx::DOUBLE - sum_x::DOUBLE * sum_x::DOUBLE)
        |            * sqrt(n::DOUBLE * syy::DOUBLE - sum_y::DOUBLE * sum_y::DOUBLE))
        |  END AS corr
        |FROM u ORDER BY pair""".stripMargin,

    // Key-audit re-derivation: one multiplicity table per audited key
    // (unioned through a canonical string form), exact BIGINT rollups.
    "pipeline_native_cluster" ->
      (spectraClusterLabelCtes + """,
        |psm AS (
        |  SELECT spec_id, 'u' || spec_id::VARCHAR AS usi,
        |    CASE WHEN (spec_id % 1000) % 5 = 0 AND spec_id // 1000 = 1 THEN 'LEK'
        |         WHEN (spec_id % 1000) % 5 = 0 THEN 'PEK'
        |         WHEN (spec_id % 1000) % 5 = 1 THEN 'PEK'
        |         WHEN (spec_id % 1000) % 5 = 2 AND spec_id // 1000 = 1 THEN 'PEIK'
        |         WHEN (spec_id % 1000) % 5 = 2 THEN 'PELK'
        |         ELSE 'AAK' END AS seq,
        |    CASE WHEN (spec_id % 1000) % 5 = 1 THEN
        |           CASE WHEN spec_id // 1000 = 1 THEN 'PE[UNIMOD:35]K/2'
        |                WHEN spec_id // 1000 = 2 THEN 'PEK/3' ELSE 'PEK/2' END
        |         WHEN (spec_id % 1000) % 5 = 0 AND spec_id // 1000 = 1 THEN 'LEK/2'
        |         WHEN (spec_id % 1000) % 5 = 0 THEN 'PEK/2'
        |         WHEN (spec_id % 1000) % 5 = 2 AND spec_id // 1000 = 1 THEN 'PEIK/2'
        |         WHEN (spec_id % 1000) % 5 = 2 THEN 'PELK/2'
        |         ELSE 'AAK/2' END AS form,
        |    ((((spec_id % 1000) * 7 + (spec_id // 1000) * 3) % 100)::DOUBLE / 100.0) AS score
        |  FROM labels),
        |members AS (
        |  SELECT l.spec_id, l.cluster_id, p.usi, p.seq, p.form, p.score
        |  FROM labels l JOIN psm p USING (spec_id)),
        |clstats AS (
        |  SELECT cluster_id, count(DISTINCT replace(seq, 'L', 'I')) AS n_iso,
        |    count(*) AS total
        |  FROM members GROUP BY cluster_id),
        |formstats AS (
        |  SELECT cluster_id, form, count(*) AS form_count
        |  FROM members GROUP BY cluster_id, form),
        |ratios AS (
        |  SELECT m.*, c.n_iso, c.total, f.form_count,
        |    f.form_count::DOUBLE / c.total AS ratio
        |  FROM members m
        |  JOIN clstats c USING (cluster_id)
        |  JOIN formstats f ON f.cluster_id = m.cluster_id AND f.form = m.form),
        |withmax AS (
        |  SELECT *, max(ratio) OVER (PARTITION BY cluster_id) AS max_ratio
        |  FROM ratios),
        |reps AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY ratio DESC, form ASC, score ASC, usi ASC) AS rn
        |    FROM withmax WHERE n_iso <= 1 AND max_ratio > 0.5)
        |  WHERE rn = 1),
        |removedcl AS (
        |  SELECT DISTINCT cluster_id,
        |    CASE WHEN n_iso > 1 THEN 'multiple_isobaric_sequences'
        |         ELSE 'no_majority_peptidoform' END AS reason
        |  FROM withmax WHERE n_iso > 1 OR max_ratio <= 0.5)
        |SELECT kind::VARCHAR AS "kind", cluster_id::BIGINT AS "cluster_id",
        |  detail::VARCHAR AS "detail"
        |FROM (
        |  SELECT 'rep' AS kind, cluster_id, usi AS detail FROM reps
        |  UNION ALL
        |  SELECT 'removed', cluster_id, reason FROM removedcl)
        |ORDER BY "kind", "cluster_id"""".stripMargin),


    // Cross-corpus fuzzy decontamination: the dd_minhash_lsh re-derivation
    // with the band join taken BETWEEN the train/bench slices, verified
    // estimates aggregated to a per-train-doc max, and unflagged docs
    // surfaced with 0.0 via the left join.
    "j_guarded_join" ->
      """SELECT e.user_id, e.event_id, d.first_type
        |FROM events e
        |JOIN (SELECT user_id, min(event_type) AS first_type
        |      FROM events GROUP BY user_id) d
        |  ON d.user_id = e.user_id
        |ORDER BY e.event_id""".stripMargin,

    // CDC-apply re-derivation: the champion change as a row_number window
    // (versions are unique event_ids, so ORDER BY v DESC is the same
    // winner as the engine's lexicographic struct max), then the
    // full-outer upsert/delete merge. Payloads pass through untouched —
    // bit-identical doubles, no arithmetic.
    "p11_rt_fallback" ->
      """SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'O'),
        |  nullif(o_orderpriority, '1-URGENT'), 'NONE') AS resolved
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p14_checksum" ->
      """SELECT doc_id, sha256(text) AS sha256 FROM documents ORDER BY doc_id""".stripMargin,

    "d1_distinct" ->
      """SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority""".stripMargin,

    "p_string_family" ->
      """SELECT doc_id,
        |  upper(substr(source, 1, 1)) || substr(source, 2, 100) AS capitalized,
        |  contains(text, 'spark') AS has_spark,
        |  starts_with(source, 'src1') AS is_src1,
        |  translate(lang, 'aeiou', 'AEIOU') AS lang_vowels,
        |  printf('%s|%04d', lang, doc_id) AS formatted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f13_scanid_validity" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN 'sample=1 period=1 cycle=1 experiment=' || doc_id::VARCHAR
        |       WHEN doc_id % 7 = 0 THEN 'scan' || doc_id::VARCHAR
        |       ELSE doc_id::VARCHAR END AS scan_id
        |  FROM documents)
        |SELECT doc_id, scan_id,
        |  regexp_full_match(scan_id, '[+-]?\d+') OR
        |  (contains(scan_id, 'sample') AND contains(scan_id, 'period')
        |    AND contains(scan_id, 'cycle') AND contains(scan_id, 'experiment')) AS is_valid
        |FROM s ORDER BY doc_id""".stripMargin,

    "f14_score_filter" ->
      """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey < 200),
        |p AS (
        |  SELECT l_orderkey, l_linenumber, 'MS:1001155' AS accession,
        |    l_discount::VARCHAR AS value FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'MS:1002355', '0.01' FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'MS:1001171',
        |    CASE WHEN l_quantity > 25 THEN l_quantity::VARCHAR END FROM li)
        |SELECT l_orderkey, l_linenumber, accession, value FROM p
        |WHERE value IS NOT NULL AND value <> 'NaN'
        |  AND TRY_CAST(value AS DOUBLE) IS NOT NULL AND TRY_CAST(value AS DOUBLE) <> 0.0
        |  AND accession NOT IN ('MS:1002355', 'MS:1002354')
        |ORDER BY l_orderkey, l_linenumber, accession""".stripMargin,

    "s8_ftp_rewrite" ->
      """SELECT doc_id,
        |  regexp_replace('ftp://ftp.host.org/' || source || '/' || doc_id::VARCHAR || '.mgf',
        |    '^ftp://', 'https://') AS https_url
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Contamination-rate re-derivation: the decontaminate flag CTEs
    // rolled up per source through the proven Wilson tail.
    "fdr_protein_occam" ->
      """SELECT c0::VARCHAR AS "assay", c1::VARCHAR AS "accession", c2::VARCHAR AS "anchorProtein", c3::VARCHAR AS "memberType", c4::INTEGER AS "groupId", c5::INTEGER AS "numberPeptides" FROM (VALUES ('x', 'P1', 'P1', 'representative', 0, 2), ('x', 'P2', 'P1', 'sameset', 0, 2), ('x', 'P3', 'P1', 'subset', 2, 1), ('x', 'P4', 'P4', 'representative', 1, 1)) AS t(c0, c1, c2, c3, c4, c5) ORDER BY "accession"""",

    // Expected row: F9 counters from the 8-row demo assay (7 unique PSMs
    // after the per-psmId dedup, 1 decoy) + F10 post-join delta counters
    // (synthetic demo precursors sit far from the peptide masses).
    "pipeline_validity" ->
      """SELECT 7::BIGINT AS nr_psms, 1::BIGINT AS nr_decoys,
        |  3::BIGINT AS nr_error_delta, 1::BIGINT AS hard_delta_fail""".stripMargin,

    // Expected table: A10-A12 over the 7-spectrum demo clusters.
    "pipeline_cluster_inference" ->
      """SELECT c0::BIGINT AS "index", c1::VARCHAR AS "usi", c2::VARCHAR AS "peptideSequence", c3::VARCHAR AS "peptidoform", c4::BOOLEAN AS "isDecoy", c5::DOUBLE AS "score", c6::BIGINT AS "clusterId" FROM (VALUES (1, 'u1', 'AAK', 'AAK/2', FALSE, '0.005'::DOUBLE, 10), (6, 'u6', 'EEK', 'EEK/2', FALSE, '0.03'::DOUBLE, 13)) AS t(c0, c1, c2, c3, c4, c5, c6) ORDER BY "clusterId"""",

    // Expected table: the demo mzTab PSM section, values hand-checked.
    "io_mztab_scan" ->
      """SELECT c0::VARCHAR AS "psmId", c1::VARCHAR AS "peptideSequence", c2::VARCHAR AS "proteinAccession", c3::BOOLEAN AS "isDecoy", c4::DOUBLE AS "score", c5::INTEGER AS "charge", c6::DOUBLE AS "expMassToCharge", c7::DOUBLE AS "calcMassToCharge", c8::VARCHAR AS "modifications", c9::VARCHAR AS "sourceId", c10::INTEGER AS "msRun", c11::DOUBLE AS "retentionTime" FROM (VALUES ('1', 'PEPTIDEK', 'sp|P1', FALSE, '0.9'::DOUBLE, 2, '445.1'::DOUBLE, '445.0'::DOUBLE, '{"3":"UNIMOD:35"}', 'index=0', 1, NULL), ('2', 'ELVISLIVESK', 'DECOY_sp|P2', TRUE, '0.8'::DOUBLE, 3, '500.0'::DOUBLE, '500.2'::DOUBLE, '{}', 'index=1', 1, NULL)) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11) ORDER BY "psmId"""",

    // Expected tables for the IO fixture catalog queries (S1/S2/S3/S4/
    // S7/K4/F1/F2/S8) — generated by tools/gen_values_oracle.py from the
    // fixed fixture content, then reviewed.
    "io_archive_json_roundtrip" ->
      """SELECT c0::VARCHAR AS "usi", c1::VARCHAR AS "batch", c2::VARCHAR AS "peptideSequence", c3::VARCHAR AS "peptidoform", c4::BOOLEAN AS "isDecoy", c5::BOOLEAN AS "isValid", c6::DOUBLE AS "precursorMz", c7::INTEGER AS "precursorCharge", c8::INTEGER AS "numPeaks", c9::INTEGER AS "missedCleavages", c10::VARCHAR AS "proteinAccessions", c11::VARCHAR AS "masses", c12::VARCHAR AS "intensities" FROM (VALUES ('mzspec:PXDTEST:run1:index:1', 'run1', 'PEPTIDEK', 'PEP[UNIMOD:35]TIDEK/2', FALSE, TRUE, '400.0'::DOUBLE, 2, 3, 0, '["sp|P1"]', '[100.0,200.0,300.0]', '[10.0,20.0,30.0]'), ('mzspec:PXDTEST:run1:index:2', 'run1', 'ELVISLIVESK', 'ELVISLIVESK/2', FALSE, TRUE, '401.0'::DOUBLE, 2, 3, 0, '["sp|P1","sp|P2"]', '[100.0,200.0,300.0]', '[10.0,20.0,30.0]'), ('mzspec:PXDTEST:run1:index:3', 'run1', 'AAAAKPEPR', 'AAAAKPEPR/2', FALSE, TRUE, '402.0'::DOUBLE, 2, 3, 0, '["sp|P2"]', '[100.0,200.0,300.0]', '[10.0,20.0,30.0]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12) ORDER BY "usi"""",
    "io_spectra_formats" ->
      """SELECT c0::VARCHAR AS "fileName", c1::VARCHAR AS "fileType", c2::BIGINT AS "index", c3::VARCHAR AS "scanId", c4::VARCHAR AS "title", c5::INTEGER AS "msLevel", c6::DOUBLE AS "precursorMz", c7::INTEGER AS "precursorCharge", c8::DOUBLE AS "retentionTime", c9::INTEGER AS "n_peaks", c10::VARCHAR AS "masses", c11::VARCHAR AS "intensities" FROM (VALUES ('legacy.xml', 'PRIDE', 0, '3', '3', 2, '445.12'::DOUBLE, 2, '33.5'::DOUBLE, 2, '[100.5,200.25]', '[10.0,20.0]'), ('one.dta', 'DTA', 0, '0', '', 2, '445.998638'::DOUBLE, 2, NULL, 2, '[100.0,200.0]', '[10.0,20.0]'), ('run.apl', 'APL', 0, '0', 'RawFile: r1 Index: 5', 2, '445.12'::DOUBLE, 2, NULL, 2, '[100.0,200.0]', '[10.0,20.0]'), ('run.ms2', 'MS2', 0, '7', '', 2, '445.5'::DOUBLE, 2, NULL, 2, '[100.0,200.0]', '[10.0,20.0]'), ('run.ms2', 'MS2', 1, '9', '', 2, '600.25'::DOUBLE, 0, NULL, 1, '[300.0]', '[30.0]'), ('run.pkl', 'PKL', 0, '0', '', 2, '445.5'::DOUBLE, 2, NULL, 2, '[100.0,200.0]', '[10.0,20.0]'), ('run.pkl', 'PKL', 1, '1', '', 2, '600.25'::DOUBLE, 3, NULL, 1, '[300.0]', '[30.0]'), ('run1.mgf', 'MGF', 0, '0', 'spec0', 2, '445.12'::DOUBLE, 2, '12.5'::DOUBLE, 2, '[100.0,200.0]', '[10.0,20.0]'), ('run1.mgf', 'MGF', 1, '1', 'spec1', 2, '512.75'::DOUBLE, 3, NULL, 1, '[55.5]', '[1.0]'), ('run2.mzML', 'MZML', 0, 'controllerType=0 controllerNumber=1 scan=1', 'controllerType=0 controllerNumber=1 scan=1', 2, '445.12'::DOUBLE, 2, '12.5'::DOUBLE, 2, '[100.5,200.25]', '[10.0,20.0]'), ('run2.mzML', 'MZML', 1, 'controllerType=0 controllerNumber=1 scan=2', 'controllerType=0 controllerNumber=1 scan=2', 1, '0.0'::DOUBLE, 0, NULL, 0, '[]', '[]'), ('run3.mzXML', 'MZXML', 0, '7', '7', 2, '445.12'::DOUBLE, 2, '33.5'::DOUBLE, 2, '[100.5,200.25]', '[10.0,20.0]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11) ORDER BY "fileName", "index"""",
    "io_mzid_scan" ->
      """SELECT c0::VARCHAR AS "psmId", c1::VARCHAR AS "peptideSequence", c2::VARCHAR AS "proteinAccession", c3::BOOLEAN AS "isDecoy", c4::DOUBLE AS "score", c5::INTEGER AS "rank", c6::INTEGER AS "charge", c7::DOUBLE AS "expMassToCharge", c8::DOUBLE AS "calcMassToCharge", c9::VARCHAR AS "modifications", c10::VARCHAR AS "sourceId", c11::VARCHAR AS "location", c12::VARCHAR AS "idFormatAccession" FROM (VALUES ('sii1', 'PEPTIDEK', 'sp|Q1', FALSE, '0.001'::DOUBLE, 1, 2, '458.23'::DOUBLE, '458.22'::DOUBLE, '{"3":"UNIMOD:35"}', 'index=0', 'file://data/run1.mgf', 'MS:1000774'), ('sii2', 'ELVISLIVESK', 'DECOY_sp|Q2', TRUE, '0.02'::DOUBLE, 1, 3, '600.0'::DOUBLE, '600.1'::DOUBLE, '{}', 'controllerType=0 controllerNumber=1 scan=7', 'file://data/run2.mzML', 'MS:1001530')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12) ORDER BY "psmId", "proteinAccession"""",
    // Expected table: the PRIDE XML identification fixture, hand-checked.
    "io_pridexml_ident" ->
      """SELECT c0::VARCHAR AS "psmId", c1::VARCHAR AS "peptideSequence", c2::VARCHAR AS "proteinAccession", c3::VARCHAR AS "database", c4::BOOLEAN AS "isDecoy", c5::DOUBLE AS "score", c6::INTEGER AS "charge", c7::DOUBLE AS "expMassToCharge", c8::VARCHAR AS "modifications", c9::VARCHAR AS "sourceId", c10::INTEGER AS "start", c11::INTEGER AS "end" FROM (VALUES ('legacy_ident.xml:1:PEPTIDEK:3=MOD:00696', 'PEPTIDEK', 'sp|A1', 'SWISSPROT', FALSE, '47.15'::DOUBLE, NULL, NULL, '{"3":"MOD:00696"}', '1', 10, 17), ('legacy_ident.xml:2:ELVISLIVESK', 'ELVISLIVESK', 'sp|A1', 'SWISSPROT', FALSE, '30.5'::DOUBLE, 2, NULL, '{}', '2', NULL, NULL), ('legacy_ident.xml:2:ELVISLIVESK', 'ELVISLIVESK', 'sp|A2', NULL, FALSE, '30.5'::DOUBLE, 2, NULL, '{}', '2', NULL, NULL), ('legacy_ident.xml:3:DECOYPEPK', 'DECOYPEPK', 'DECOY_sp|A9', NULL, TRUE, '5.0'::DOUBLE, NULL, NULL, '{}', '3', NULL, NULL)) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11) ORDER BY "psmId", "proteinAccession"""",

    "io_rest_catalog" ->
      """SELECT c0::VARCHAR AS "accession", c1::VARCHAR AS "fileName", c2::VARCHAR AS "category_accession", c3::VARCHAR AS "category", c4::BOOLEAN AS "is_result", c5::VARCHAR AS "uncompressed_name", c6::BOOLEAN AS "was_compressed", c7::VARCHAR AS "https_url" FROM (VALUES ('PXF1', 'assay1.mzid', 'PRIDE:1002847', 'RESULT', TRUE, 'assay1.mzid', FALSE, 'https://ftp.pride.ebi.ac.uk/2020/01/PXD1/assay1.mzid'), ('PXF2', 'run1.mgf.gz', 'PRIDE:1002846', 'PEAK', FALSE, 'run1.mgf', TRUE, 'https://ftp.pride.ebi.ac.uk/2020/01/PXD1/run1.mgf.gz'), ('PXF3', 'junk.mztab', 'PRIDE:1002848', 'RESULT', FALSE, 'junk.mztab', FALSE, 'https://ftp.pride.ebi.ac.uk/2020/02/PXD1/junk.mztab'), ('PXF5', 'other.zip', 'PRIDE:1002846', 'PEAK', FALSE, 'other', TRUE, 'https://ftp.pride.ebi.ac.uk/2020/03/PXD1/other.zip')) AS t(c0, c1, c2, c3, c4, c5, c6, c7) ORDER BY "accession"""",
    "io_sdrf_melt" ->
      """SELECT c0::VARCHAR AS "fileKey", c1::VARCHAR AS "accession", c2::VARCHAR AS "name", c3::VARCHAR AS "value" FROM (VALUES ('run1', 'EFO:0000634', 'organism', 'Homo sapiens'), ('run1', 'EFO:0000635', 'organism part', 'liver'), ('run1', NULL, 'spiked compound', 'yes'), ('run2', 'EFO:0000634', 'organism', 'Mus musculus'), ('run2', 'EFO:0000635', 'organism part', 'brain'), ('run2', NULL, 'spiked compound', 'no')) AS t(c0, c1, c2, c3) ORDER BY "fileKey", "name"""",
    "io_tsv_roundtrip" ->
      """SELECT c0::VARCHAR AS "name", c1::VARCHAR AS "date", c2::VARCHAR AS "accession", c3::VARCHAR AS "ftp" FROM (VALUES ('assay1.mzid', '2020-01-15', 'PXF1', 'ftp://ftp.pride.ebi.ac.uk/2020/01/PXD1/assay1.mzid'), ('run1.mgf.gz', '2020-01-15', 'PXF2', 'ftp://ftp.pride.ebi.ac.uk/2020/01/PXD1/run1.mgf.gz'), ('junk.mztab', '2020-02-01', 'PXF3', 'ftp://ftp.pride.ebi.ac.uk/2020/02/PXD1/junk.mztab'), ('other.zip', '2020-03-10', 'PXF5', 'ftp://ftp.pride.ebi.ac.uk/2020/03/PXD1/other.zip')) AS t(c0, c1, c2, c3) ORDER BY "accession"""",

    // Expected table: MGF write->read round-trip of the demo assay.
    "io_mgf_roundtrip" ->
      """SELECT c0::BIGINT AS "index", c1::VARCHAR AS "scanId", c2::VARCHAR AS "title", c3::INTEGER AS "msLevel", c4::DOUBLE AS "precursorMz", c5::INTEGER AS "precursorCharge", c6::DOUBLE AS "retentionTime", c7::VARCHAR AS "masses", c8::VARCHAR AS "intensities" FROM (VALUES (0, '0', 'id=mzspec:PXDTEST:run1:index:1,sequence=PEP[UNIMOD:35]TIDEK/2', 2, '400.0'::DOUBLE, 2, NULL, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]'), (1, '1', 'id=mzspec:PXDTEST:run1:index:2,sequence=ELVISLIVESK/2', 2, '401.0'::DOUBLE, 2, NULL, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]'), (2, '2', 'id=mzspec:PXDTEST:run1:index:3,sequence=AAAAKPEPR/2', 2, '402.0'::DOUBLE, 2, NULL, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8) ORDER BY "index"""",

    // Expected table: F8/F11 gate-differentiating assay variant (PIA
    // unique-peptide semantics, uniquePeptides=1) — sp|P4 present (its one
    // peptide is UNIQUE to it; the old distinct-count >= 2 gate dropped
    // it), sp|P5/sp|P6 absent (2 distinct peptides each but 0 unique —
    // the old gate kept them, their PSMs survive as index:9/index:10),
    // PSM 9's spectrum absent (msLevel-1).
    "pipeline_filter_gates" ->
      """SELECT c0::VARCHAR AS "kind", c1::VARCHAR AS "id" FROM (VALUES ('protein', 'sp|P1'), ('protein', 'sp|P2'), ('protein', 'sp|P4'), ('spectrum', 'mzspec:PXDTEST:run1:index:1'), ('spectrum', 'mzspec:PXDTEST:run1:index:10'), ('spectrum', 'mzspec:PXDTEST:run1:index:2'), ('spectrum', 'mzspec:PXDTEST:run1:index:3'), ('spectrum', 'mzspec:PXDTEST:run1:index:8'), ('spectrum', 'mzspec:PXDTEST:run1:index:9')) AS t(c0, c1) ORDER BY "kind", "id"""",

    // Expected table: the full generate-index-files protein output on
    // the demo assay (complex columns as their JSON text).
    "pipeline_index_proteins" ->
      """SELECT c0::VARCHAR AS "reportedAccession", c1::VARCHAR AS "projectAccession", c2::VARCHAR AS "assayAccession", c3::VARCHAR AS "reanalysisAccession", c4::BOOLEAN AS "isValid", c5::BOOLEAN AS "isDecoy", c6::INTEGER AS "numberPeptides", c7::INTEGER AS "numberPSMs", c8::VARCHAR AS "modificationsNames", c9::VARCHAR AS "bestSearchEngineScore", c10::VARCHAR AS "properties", c11::VARCHAR AS "qualityEstimationMethods", c12::VARCHAR AS "psmAccessions" FROM (VALUES ('sp|P1', 'PXDTEST', 'assay1', NULL, TRUE, FALSE, 2, 2, '["UNIMOD:35"]', '{"accession":"MS:1002355","name":"protein-level q-value","value":"1.77814"}', '[{"accession":"MS:1001600","name":"protein inference confidence category","value":"distinguishable"},{"accession":"MS:1002404","name":"multiplicative protein score (-sum log10 q)","value":"3.55629"}]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]', '[{"charge":2,"precursorMass":607.38,"usi":"mzspec:PXDTEST:run1:index:2","peptideSequence":"ELVISLIVESK","peptidoform":"ELVISLIVESK"},{"charge":2,"precursorMass":458.23,"usi":"mzspec:PXDTEST:run1:index:1","peptideSequence":"PEPTIDEK","peptidoform":"PEP[UNIMOD:35]TIDEK"}]'), ('sp|P2', 'PXDTEST', 'assay1', NULL, TRUE, FALSE, 2, 2, '[]', '{"accession":"MS:1002355","name":"protein-level q-value","value":"1.77814"}', '[{"accession":"MS:1001600","name":"protein inference confidence category","value":"distinguishable"},{"accession":"MS:1002404","name":"multiplicative protein score (-sum log10 q)","value":"3.55629"}]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]', '[{"charge":2,"precursorMass":456.76,"usi":"mzspec:PXDTEST:run1:index:3","peptideSequence":"AAAAKPEPR","peptidoform":"AAAAKPEPR"},{"charge":2,"precursorMass":607.38,"usi":"mzspec:PXDTEST:run1:index:2","peptideSequence":"ELVISLIVESK","peptidoform":"ELVISLIVESK"}]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12) ORDER BY "reportedAccession"""",

    // Expected table: multi-result-file assay. 4 rows: the overlapping
    // index=1 spectrum appears ONCE (PSM set merged across a.mzid/b.mzid)
    // and carries the UNION of both files' evidence — sp|Q5 comes only
    // from the LOSING file (a.mzid, 0.01 vs b's 0.002 with lower-better);
    // RANKTWOPEPK absent (rank-2, setAllTopIdentifications(1)); decoy
    // q = 1/3 pins the merged-set FDR denominator (unmerged would be 1/4).
    "pipeline_multifile" ->
      """SELECT c0::VARCHAR AS "usi", c1::VARCHAR AS "peptideSequence", c2::BOOLEAN AS "isDecoy", c3::VARCHAR AS "proteinAccessions", c4::VARCHAR AS "q_value" FROM (VALUES ('mzspec:PXDMULTI:run1:index:1', 'PEPTIDEK', FALSE, '["sp|Q1"]', '0.033333'), ('mzspec:PXDMULTI:run1:index:2', 'ELVISLIVESK', FALSE, '["sp|Q3","sp|Q5"]', '0.033333'), ('mzspec:PXDMULTI:run1:index:3', 'DECOYPEPK', TRUE, '["DECOY_sp|Q7"]', '0.3333333333333333'), ('mzspec:PXDMULTI:run1:index:4', 'AAAAKPEPR', FALSE, '["sp|Q4"]', '0.033333')) AS t(c0, c1, c2, c3, c4) ORDER BY "usi"""",

    // Expected table: PRIDE XML e2e. Charge /2 on every peptidoform comes
    // from the SPECTRUM precursor (PSM 1 carries no charge cvParam);
    // index:2 holds both accessions (one content-derived psmId for the
    // shared peptide); decoy q = 1 decoy / 2 targets; target q = the P9
    // repair (min nonzero q / 10).
    "pipeline_pridexml" ->
      """SELECT c0::VARCHAR AS "usi", c1::VARCHAR AS "peptideSequence", c2::VARCHAR AS "peptidoform", c3::BOOLEAN AS "isDecoy", c4::INTEGER AS "precursorCharge", c5::VARCHAR AS "proteinAccessions", c6::VARCHAR AS "q_value" FROM (VALUES ('mzspec:PXDPRIDE:legacyident:index:1', 'PEPTIDEK', 'PEP[MOD:00696]TIDEK/2', FALSE, 2, '["sp|A1"]', '0.05'), ('mzspec:PXDPRIDE:legacyident:index:2', 'ELVISLIVESK', 'ELVISLIVESK/2', FALSE, 2, '["sp|A1","sp|A2"]', '0.05'), ('mzspec:PXDPRIDE:legacyident:index:3', 'DECOYPEPK', 'DECOYPEPK/2', TRUE, 2, '["DECOY_sp|A9"]', '0.5')) AS t(c0, c1, c2, c3, c4, c5, c6) ORDER BY "usi"""",

    // Expected table: picked protein FDR on the demo assay + paired decoy
    // under loose q gates. DECOY_sp|P1 is absent (lost the pair
    // competition to sp|P1); the UNPAIRED DECOY_P9 survives — picked
    // competition only removes losing members of target/decoy pairs.
    "pipeline_picked_fdr" ->
      """SELECT c0::VARCHAR AS "reportedAccession", c1::BOOLEAN AS "isDecoy", c2::INTEGER AS "numberPeptides", c3::INTEGER AS "numberPSMs" FROM (VALUES ('DECOY_P9', TRUE, 1, 1), ('sp|P1', FALSE, 2, 2), ('sp|P2', FALSE, 2, 2)) AS t(c0, c1, c2, c3) ORDER BY "reportedAccession"""",

    // Expected table: the PIA protein-FDR parity variant (proteins scored
    // off the PSM-level FDR score; see pipeline_proteins_combined_fdr in
    // queries) — values hand-checked: sp|P1 = -log10(.0238095)-log10(.047619)
    // = 2.94547, sp|P2 = -log10(.047619)-log10(.0714286) = 2.46835.
    "pipeline_proteins_combined_fdr" ->
      """SELECT c0::VARCHAR AS "reportedAccession", c1::VARCHAR AS "projectAccession", c2::VARCHAR AS "assayAccession", c3::VARCHAR AS "reanalysisAccession", c4::BOOLEAN AS "isValid", c5::BOOLEAN AS "isDecoy", c6::INTEGER AS "numberPeptides", c7::INTEGER AS "numberPSMs", c8::VARCHAR AS "modificationsNames", c9::VARCHAR AS "bestSearchEngineScore", c10::VARCHAR AS "properties", c11::VARCHAR AS "qualityEstimationMethods", c12::VARCHAR AS "psmAccessions" FROM (VALUES ('sp|P1', 'PXDTEST', 'assay1', NULL, TRUE, FALSE, 2, 2, '["UNIMOD:35"]', '{"accession":"MS:1002355","name":"protein-level q-value","value":"2.94547"}', '[{"accession":"MS:1001600","name":"protein inference confidence category","value":"distinguishable"},{"accession":"MS:1002404","name":"multiplicative protein score (-sum log10 FDRScore)","value":"2.94547"}]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]', '[{"charge":2,"precursorMass":607.38,"usi":"mzspec:PXDTEST:run1:index:2","peptideSequence":"ELVISLIVESK","peptidoform":"ELVISLIVESK"},{"charge":2,"precursorMass":458.23,"usi":"mzspec:PXDTEST:run1:index:1","peptideSequence":"PEPTIDEK","peptidoform":"PEP[UNIMOD:35]TIDEK"}]'), ('sp|P2', 'PXDTEST', 'assay1', NULL, TRUE, FALSE, 2, 2, '[]', '{"accession":"MS:1002355","name":"protein-level q-value","value":"2.46835"}', '[{"accession":"MS:1001600","name":"protein inference confidence category","value":"distinguishable"},{"accession":"MS:1002404","name":"multiplicative protein score (-sum log10 FDRScore)","value":"2.46835"}]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]', '[{"charge":2,"precursorMass":456.76,"usi":"mzspec:PXDTEST:run1:index:3","peptideSequence":"AAAAKPEPR","peptidoform":"AAAAKPEPR"},{"charge":2,"precursorMass":607.38,"usi":"mzspec:PXDTEST:run1:index:2","peptideSequence":"ELVISLIVESK","peptidoform":"ELVISLIVESK"}]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12) ORDER BY "reportedAccession"""",

    // Expected table: the full generate-index-files spectrum output on
    // the demo assay (complex columns as their JSON text).
    "pipeline_index_spectra" ->
      """SELECT c0::VARCHAR AS "usi", c1::VARCHAR AS "spectraUsi", c2::VARCHAR AS "projectAccession", c3::VARCHAR AS "assayAccession", c4::VARCHAR AS "reanalysisAccession", c5::VARCHAR AS "peptideSequence", c6::VARCHAR AS "peptidoform", c7::BOOLEAN AS "isDecoy", c8::BOOLEAN AS "isValid", c9::DOUBLE AS "retentionTime", c10::INTEGER AS "msLevel", c11::INTEGER AS "precursorCharge", c12::DOUBLE AS "precursorMz", c13::VARCHAR AS "masses", c14::VARCHAR AS "intensities", c15::INTEGER AS "numPeaks", c16::INTEGER AS "missedCleavages", c17::VARCHAR AS "proteinAccessions", c18::VARCHAR AS "modifications", c19::VARCHAR AS "bestSearchEngineScore", c20::VARCHAR AS "scores", c21::VARCHAR AS "properties", c22::VARCHAR AS "sampleProperties", c23::VARCHAR AS "qualityEstimationMethods" FROM (VALUES ('mzspec:PXDTEST:run1:index:1', 'mzspec:PXDTEST:run1:index:1', 'PXDTEST', 'assay1', NULL, 'PEPTIDEK', 'PEP[UNIMOD:35]TIDEK/2', FALSE, TRUE, '60.0'::DOUBLE, 2, 2, '400.0'::DOUBLE, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]', 3, 0, '["sp|P1"]', '[{"positionMap":[{"position":3,"probabilities":[]}],"modification":{"cvLabel":"UNIMOD","accession":"UNIMOD:35","name":"UNIMOD:35"},"properties":[]}]', '{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"}', '[{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"},{"accession":"MS:1002354","name":"PSM-level FDRScore","value":"0.023809523809523808"}]', '[{"accession":"PRIDE:0000511","name":"delta m/z","value":"14.502186"}]', '[]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]'), ('mzspec:PXDTEST:run1:index:2', 'mzspec:PXDTEST:run1:index:2', 'PXDTEST', 'assay1', NULL, 'ELVISLIVESK', 'ELVISLIVESK/2', FALSE, TRUE, '61.0'::DOUBLE, 2, 2, '401.0'::DOUBLE, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]', 3, 0, '["sp|P1","sp|P2"]', '[]', '{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"}', '[{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"},{"accession":"MS:1002354","name":"PSM-level FDRScore","value":"0.047619047619047616"}]', '[{"accession":"PRIDE:0000511","name":"delta m/z","value":"7.991189"}]', '[]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]'), ('mzspec:PXDTEST:run1:index:3', 'mzspec:PXDTEST:run1:index:3', 'PXDTEST', 'assay1', NULL, 'AAAAKPEPR', 'AAAAKPEPR/2', FALSE, TRUE, '62.0'::DOUBLE, 2, 2, '402.0'::DOUBLE, '[100.0,200.0,300.0]', '[10.0,20.0,30.0]', 3, 0, '["sp|P2"]', '[]', '{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"}', '[{"accession":"MS:1002355","name":"PSM-level q-value","value":"0.016667"},{"accession":"MS:1002354","name":"PSM-level FDRScore","value":"0.07142857142857142"}]', '[{"accession":"PRIDE:0000511","name":"delta m/z","value":"1.001131"}]', '[]', '[{"accession":"MS:1001194","name":"quality estimation by decoy database","value":"true"}]')) AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12, c13, c14, c15, c16, c17, c18, c19, c20, c21, c22, c23) ORDER BY "usi"""",

    // Expected table: deterministic FNV-checksum stub features over the
    // first 50 documents. Pinned at sf0.01 — the driver's correctness SF
    // (the media payloads derive from the documents table, so the expected
    // values are per-SF by construction).
    "fdr_combined_score" ->
      """WITH ev AS (
        |  SELECT CASE WHEN event_id % 2 = 0 THEN 'engineA' ELSE 'engineB' END AS engine,
        |    'spec' || (event_id // 4)::VARCHAR AS spectrum,
        |    'PEP' || (event_id // 4)::VARCHAR AS peptide,
        |    value AS score, event_type = 'error' AS decoy, event_id::VARCHAR AS psmId
        |  FROM events WHERE event_id < 2000),
        |cum AS (
        |  SELECT *,
        |    sum(CASE WHEN decoy THEN 1 ELSE 0 END) OVER wb AS cum_decoys,
        |    sum(CASE WHEN decoy THEN 0 ELSE 1 END) OVER wb AS cum_targets,
        |    row_number() OVER wo AS rn
        |  FROM ev
        |  WINDOW wb AS (PARTITION BY engine ORDER BY score DESC, psmId ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wo AS (PARTITION BY engine ORDER BY score DESC, psmId ASC)),
        |f AS (SELECT *, cum_decoys::DOUBLE / greatest(cum_targets, 1) AS fdr FROM cum),
        |qv AS (
        |  SELECT *, min(fdr) OVER (PARTITION BY engine ORDER BY score ASC, psmId DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_value
        |  FROM f),
        |interp AS (
        |  SELECT *,
        |    coalesce(last_value(CASE WHEN decoy THEN rn END IGNORE NULLS) OVER wp, 0) AS r0,
        |    coalesce(last_value(CASE WHEN decoy THEN q_value END IGNORE NULLS) OVER wp, 0.0) AS q0,
        |    first_value(CASE WHEN decoy THEN rn END IGNORE NULLS) OVER wn AS r1,
        |    first_value(CASE WHEN decoy THEN q_value END IGNORE NULLS) OVER wn AS q1
        |  FROM qv
        |  WINDOW wp AS (PARTITION BY engine ORDER BY score DESC, psmId ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY engine ORDER BY score DESC, psmId ASC
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |fs AS (
        |  SELECT *, CASE WHEN r1 IS NULL THEN q_value WHEN r1 = r0 THEN q1
        |    ELSE q0 + (rn - r0)::DOUBLE * (q1 - q0) / (r1 - r0)::DOUBLE END AS fdr_score
        |  FROM interp),
        |bpe AS (
        |  SELECT spectrum, peptide, engine, min(fdr_score) AS fdr_score, max(decoy) AS dec
        |  FROM fs GROUP BY spectrum, peptide, engine),
        |comb AS (
        |  SELECT spectrum, peptide,
        |    to_json(list_sort(list_distinct(list(engine)))) AS engines,
        |    max(dec) AS is_decoy,
        |    list_reduce(list_prepend(1.0::DOUBLE, list_sort(list(greatest(fdr_score, 1e-12)))),
        |      (a, b) -> a * b) AS combined_fdr_score,
        |    min(fdr_score) AS best_engine_fdr_score
        |  FROM bpe GROUP BY spectrum, peptide),
        |cum2 AS (
        |  SELECT *,
        |    sum(CASE WHEN is_decoy THEN 1 ELSE 0 END) OVER wb2 AS cd,
        |    sum(CASE WHEN is_decoy THEN 0 ELSE 1 END) OVER wb2 AS ct
        |  FROM comb
        |  WINDOW wb2 AS (PARTITION BY engines
        |                 ORDER BY combined_fdr_score ASC, spectrum ASC, peptide ASC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f2 AS (SELECT *, cd::DOUBLE / greatest(ct, 1) AS fdr2 FROM cum2),
        |q2 AS (
        |  SELECT *, min(fdr2) OVER (PARTITION BY engines
        |    ORDER BY combined_fdr_score DESC, spectrum DESC, peptide DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS combined_q_value
        |  FROM f2)
        |SELECT spectrum, peptide, engines, is_decoy, combined_fdr_score,
        |  best_engine_fdr_score, combined_q_value
        |FROM q2 ORDER BY spectrum, peptide""".stripMargin,

    // Stage-wise SQL composition of the corpus pipeline: quality gate ->
    // langid -> exact dedup -> MinHash-LSH pairs -> recursive-CTE
    // connected components -> min-id representatives.
  )

  val rederiveSql: Map[String, String] = Map(
    "w3_top_rank_fx" ->
      """SELECT user_id, rank, event_id, value FROM (
        |  SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
        |  FROM (VALUES (1, 1, '0.5'::DOUBLE), (1, 2, '0.9'::DOUBLE), (1, 3, '0.9'::DOUBLE),
        |    (1, 4, '0.1'::DOUBLE), (2, 5, '1.0'::DOUBLE), (3, 6, '2.0'::DOUBLE),
        |    (3, 7, '3.0'::DOUBLE), (3, 8, '1.0'::DOUBLE)) AS t(user_id, event_id, value))
        |WHERE rank <= 2 ORDER BY user_id, rank""".stripMargin,

  )

}
