package graft

import graft.fdr.TargetDecoy
import graft.functions.{PeptideFunctions, TextFunctions, UsiFunctions}
import graft.operators.{Dedup, Similarity, SpectraCluster}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + training-data-curation registry (txt_*, tdp_*) — one slice of the SURVEY.md §2 operator inventory,
  * split out of the single Queries registry in round 11 purely for
  * maintainability; keys, semantics, and oracles are unchanged and are
  * consumed only through [[Queries]]. Oracle-parity conventions are
  * documented on [[Queries]]. */
private[graft] object QueriesTextCuration {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_vocabulary" -> ((s, dir) => {
      graft.operators.Search.vocabulary(t(s, dir, "documents"), col("text"), topK = 50)
    }),

    // CMS join-cardinality estimation: |orders ⋈ lineitem| estimated from
    // two bounded sketches (min over rows of the counter inner product —
    // exact BIGINT arithmetic) next to the true join count. The planner
    // primitive for salting/broadcast decisions without running the join.
    // The ratio column makes the additive |A||B|/width error VISIBLE:
    // ~1.0x at sf0.001, ~3x at sf0.1 (150k x 600k keys over 65536
    // buckets) — right on the documented bound; production sizing is
    // width ≈ |A||B| / tolerable_error.
    "tdp_cms_join_size" -> ((s, dir) => {
      import graft.operators.Sketches
      val d = 4; val w = 65536
      val o = Sketches.cmsSketchByGroup(
        t(s, dir, "orders"), Seq(lit(1).as("g")), col("o_orderkey"), d, w)
        .select(col("counters").as("ca"))
      val l = Sketches.cmsSketchByGroup(
        t(s, dir, "lineitem"), Seq(lit(1).as("g")), col("l_orderkey"), d, w)
        .select(col("counters").as("cb"))
      val exact = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact"))
      o.crossJoin(l).crossJoin(exact)
        .select(
          Sketches.cmsJoinSizeEstimate(col("ca"), col("cb"), d, w).as("est"),
          col("exact"),
          (Sketches.cmsJoinSizeEstimate(col("ca"), col("cb"), d, w).cast("double") /
            col("exact")).as("ratio"))
    }),

    // Fixed-point PageRank over the near-dup similarity graph (canonical-
    // member centrality): the dd_minhash_lsh pair derivation feeds the
    // integer-arithmetic PageRank loop — BIGINT contributions/sums, so
    // the result is partitioning-independent and the oracle replays all
    // three iterations bit-identically. The contract ships ONLY the
    // exact BIGINT picorank (the display double rank_fp/1e12 stays an
    // API-level convenience) — r6 lesson: any runtime-recomputed raw
    // DOUBLE output column is oracle-environment-sensitive.
    "tdp_graph_rank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedLshPairs(s, dir)
      graft.operators.Graph.pageRankFixedPoint(pairs, iters = 3)
        .select(col("id"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("id"))
    }),

    // Per-node triangle counts (round-9) over the same near-dup LSH pair
    // graph — degree-ordered node-iterator (each edge oriented low→high
    // under (deg, id), wedges at the apex, closed against the edge list);
    // separates tight template cliques from hub false positives.
    "tdp_graph_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedLshPairs(s, dir)
      graft.operators.Graph.triangleCounts(pairs)
    }),

    // 2-core of the near-dup graph (round-13): synchronous peeling to
    // the fixpoint — template families (cycles) survive, hub-and-spokes
    // false-positive stars peel away. The oracle replays 64 synchronous
    // peel rounds through a recursive CTE (the engine hard-errors past
    // 64, so cap divergence is loud, never silent); exact BIGINT degrees.
    "tdp_graph_kcore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedLshPairs(s, dir)
      graft.operators.Graph.kCore(pairs, k = 2)
    }),

    // Canonical member per near-dup component by PageRank centrality
    // (round-10): the "most representative duplicate" survivor policy —
    // CC labels (min-id components) joined with the fixed-point BIGINT
    // picoranks, one winner per component at (rank_fp desc, id). Ships
    // only exact integers + the boolean flag (rank_fp stays the
    // tdp_graph_rank contract).
    "tdp_bt_ranking" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val pairs = d.alias("a").join(
        d.select((col("doc_id") - 1).as("doc_id"),
          col("source").as("b_source"), col("n_chars").as("b_chars")),
        Seq("doc_id"))
        .filter(col("a.source").isNotNull && col("b_source").isNotNull &&
          col("a.source") =!= col("b_source") && col("a.n_chars") =!= col("b_chars"))
      val comparisons = pairs.select(
        when(col("a.n_chars") > col("b_chars"), col("a.source"))
          .otherwise(col("b_source")).as("w"),
        when(col("a.n_chars") > col("b_chars"), col("b_source"))
          .otherwise(col("a.source")).as("l"))
      graft.operators.Preference.bradleyTerry(
        comparisons, col("w"), col("l"), iterations = 3)
    }),

    // Pairwise win rates with Wilson bounds over the same comparison set
    // as tdp_bt_ranking — the small-sample confidence gate a preference
    // dataset is audited with before fitting strengths.
    "tdp_win_rates" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val pairs = d.alias("a").join(
        d.select((col("doc_id") - 1).as("doc_id"),
          col("source").as("b_source"), col("n_chars").as("b_chars")),
        Seq("doc_id"))
        .filter(col("a.source").isNotNull && col("b_source").isNotNull &&
          col("a.source") =!= col("b_source") && col("a.n_chars") =!= col("b_chars"))
      val comparisons = pairs.select(
        when(col("a.n_chars") > col("b_chars"), col("a.source"))
          .otherwise(col("b_source")).as("w"),
        when(col("a.n_chars") > col("b_chars"), col("b_source"))
          .otherwise(col("a.source")).as("l"))
      graft.operators.Preference.winRateReport(comparisons, col("w"), col("l"))
    }),

    // DPO-style chosen/rejected pairs: per user, the highest- and
    // lowest-valued event as a preference pair with its margin (champion
    // struct extremes — one aggregation, no per-key sort window).
    "tdp_chosen_rejected" -> ((s, dir) => {
      graft.operators.Preference.chosenRejected(
        t(s, dir, "events"), col("user_id"), col("event_id"), col("value"))
        .withColumnRenamed("prompt", "user_id")
    }),

    // GRPO group advantage normalization (round-9): per user group, each
    // event's centi-quantized reward centered/scaled by the group's own
    // mean and std — exact BIGINT sums, int64→double conversions, IEEE
    // fixed-association arithmetic and one exactly-rounded sqrt; no
    // decimal→double re-conversion anywhere (the r6 red-row vector).
    "tdp_group_advantage" -> ((s, dir) => {
      graft.operators.Preference.groupAdvantage(
        t(s, dir, "events").filter(col("value").isNotNull),
        col("user_id"), col("event_id"), floor(col("value") * 100))
        .withColumnRenamed("group_id", "user_id")
        .withColumnRenamed("id", "event_id")
    }),

    // ROUGE-2 generation-eval metric (round-8): clipped bigram overlap
    // between each doc and its same-source successor.
    "txt_rouge_pairs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val pairs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("reference", lead(col("text"), 1).over(w))
        .filter(col("reference").isNotNull)
        .select(col("doc_id").as("pair_id"), col("text").as("candidate"),
          col("reference"))
      graft.operators.Search.rougeN(
        pairs, col("pair_id"), col("candidate"), col("reference"), n = 2)
        .withColumnRenamed("pair_id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // RAKE keyword extraction (round-12): stopword-delimited candidate
    // phrases, degree/freq word scores, pos-ordered fixed-fold phrase
    // scores, corpus top-30. Exact integers + one division + the proven
    // fold association — no transcendental, no rounding discipline.
    "txt_rake_keywords" -> ((s, dir) => {
      graft.operators.Search.rakeKeywords(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        stopwords = Seq("the", "a", "and", "of", "to"), topK = 30)
    }),

    // BLEU-2 generation-eval metric (round-12): clipped unigram/bigram
    // precisions + brevity penalty between each doc and its same-source
    // successor (the txt_rouge_pairs pairing). p1/p2 exact rationals;
    // bleu2 = round(geo-mean x brevity-exp, 6) on both engines (the pmi
    // 6-dp transcendental contract).
    "txt_bleu_pairs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val pairs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("reference", lead(col("text"), 1).over(w))
        .filter(col("reference").isNotNull)
        .select(col("doc_id").as("pair_id"), col("text").as("candidate"),
          col("reference"))
      graft.operators.Search.bleuPairs(
        pairs, col("pair_id"), col("candidate"), col("reference"))
        .withColumnRenamed("pair_id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Per-source Count-Min frequency sketch (native cms_sketch aggregate,
    // depth 4 x width 16 — narrower than the 31-term vocab, so collisions
    // and real overestimates occur) probed with every distinct term next
    // to its exact count. The whole counter matrix re-derives exactly in
    // DuckDB (portable md5 hash + integer bucket arithmetic).
    "tdp_cms_freq" -> ((s, dir) => {
      import graft.operators.{Search, Sketches}
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(Search.terms(col("text"))).as("term"))
      val sk = Sketches.cmsSketchByGroup(
        toks, Seq(col("source")), col("term"), depth = 4, width = 16)
      val exact = toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("exact"))
      exact.join(broadcast(sk), Seq("source"))
        .select(col("source"), col("term"), col("exact"),
          Sketches.cmsEstimate(col("counters"), col("term"), depth = 4, width = 16).as("est"),
          col("total"))
        .orderBy(col("source"), col("term"))
    }),

    // Bigram LM training (capped model): the top-400 bigram count table
    // trained over the documents corpus — two map-side-combined count
    // aggregations plus deterministic TakeOrdered caps.
    "txt_lm_train" -> ((s, dir) => {
      sharedLm(s, dir)
        .bigrams
        .orderBy(col("c").desc, col("w1"), col("w2"))
    }),

    // LM perplexity scoring (CCNet-style quality filter): stupid-backoff
    // bigram model trained on the corpus, every doc scored by mean
    // per-token negative log-prob. The caps (vocab 20 of 31, bigrams 400
    // of ~916) BIND at every SF, so the OOV and backoff paths are
    // genuinely exercised. Scoring is shuffle-free except the final
    // per-doc aggregation (model lookups are broadcast joins).
    "txt_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = sharedLm(s, dir)
      graft.operators.LanguageModel
        .scoreBigramLm(docs, col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // LM artifact round-trip (round-13): the shared bigram LM written as
    // parquet tables (counts + stats + k), reloaded, and the scoring
    // projection runs off the RELOADED model — counts are BIGINTs and k
    // a stored double, so the scores are bit-identical (same live oracle
    // as txt_lm_score).
    "txt_lm_reload" -> ((s, dir) => {
      val outDir = demoTempDir(s, "bigramlm")
      graft.operators.LanguageModel.saveBigramLm(sharedLm(s, dir), outDir)
      val lm = graft.operators.LanguageModel.loadBigramLm(s, outDir)
      graft.operators.LanguageModel
        .scoreBigramLm(t(s, dir, "documents"), col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Data-quality expectation report: five contract rules over events in
    // ONE aggregation pass (value_small deliberately fails — max value is
    // ~560 — so both report states appear).
    "tdp_expectations" -> ((s, dir) => {
      graft.operators.DataQuality.expectationReport(t(s, dir, "events"), Seq(
        "event_id_not_null" -> col("event_id").isNotNull,
        "event_type_known" ->
          col("event_type").isin("click", "view", "purchase", "signup", "error"),
        "ts_in_2024" -> (year(col("ts")) === 2024),
        "user_id_positive" -> (col("user_id") > 0),
        "value_small" -> (col("value") < 100.0)))
    }),

    // PSI distribution drift between two derived corpus snapshots on
    // n_chars (12 equal bins over [0, 600), Laplace-smoothed shares,
    // 9-dp decimal-summed contributions).
    "tdp_psi_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.DataQuality.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("n_chars"), lo = 0L, hi = 600L, buckets = 12)
    }),

    // Binned two-sample KS drift on n_chars between corpus halves — the
    // no-smoothing, no-transcendental distribution test: exact integer
    // CDF sums, single divisions, max. Window runs over 12 summary rows.
    "tdp_pps_sample" -> ((s, dir) => {
      graft.operators.Curation.ppsSample(
        t(s, dir, "documents"), col("doc_id"), length(col("text")), target = 100L)
        .select(col("doc_id"), col("source"), col("ht_weight"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic token-dropout augmentation (round-11): 10% dropout
    // keyed by hash(id:pos:seed) — the SimCSE-style contrastive-view
    // generator, bit-reproducible and re-seedable; pure projection,
    // zero shuffles.
    "tdp_augment_dropout" -> ((s, dir) => {
      graft.operators.Curation.augmentTokenDropout(
        t(s, dir, "documents"), col("doc_id"), col("text"), dropPermille = 100)
        .orderBy(col("id"))
    }),

    // T5 span-corruption augmentation (round-12): block-tiled span
    // masking with numbered sentinels + restoration targets, pure
    // projection (zero shuffle), portable-hash draws.
    "tdp_augment_spans" -> ((s, dir) => {
      graft.operators.Curation.augmentSpanCorruption(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        maskPermille = 200, blockSize = 8)
        .orderBy(col("id"))
    }),

    // Distribution-matched sampling (round-11): draw 150 docs from the
    // non-benchmark corpus so the sample's length-bucket histogram
    // matches the benchmark subset's shape (docs with doc_id % 5 = 0)
    // — the controlled-eval prep a uniform draw gets wrong whenever the
    // two populations differ.
    "tdp_distribution_match" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.matchDistribution(
        source = docs.filter(col("doc_id") % 5 =!= 0),
        sourceId = col("doc_id"),
        sourceBucket = expr("CAST(n_chars AS BIGINT) DIV 100"),
        target = docs.filter(col("doc_id") % 5 === 0),
        targetBucket = expr("CAST(n_chars AS BIGINT) DIV 100"),
        n = 150L)
    }),

    // Quality-classifier training pairs (round-11): each source's top
    // decile (chosen) paired rank-for-rank with its bottom decile
    // (rejected) — the CCNet/FineWeb prep step for training a quality
    // model on the corpus's own extremes; n_chars as the quality proxy
    // (the txt_source_percentile premise).
    "tdp_classifier_pairs" -> ((s, dir) => {
      graft.operators.Curation.classifierPairs(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("n_chars"))
    }),

    // Water-filling capped mixture (round-11): allocate a 25k-token
    // budget across sources ∝ floor(sqrt(capacity)·1e6) integer weights,
    // except no source can give more than it HAS — saturated sources'
    // freed budget re-flows to the rest via the closed-form waterline
    // (one prefix-sum pass over the |sources| frame, never iteration,
    // never the corpus). At sf0.01 several sources saturate and the
    // rest absorb the reflow — both branches exercised.
    "tdp_capped_mixture" -> ((s, dir) => {
      graft.operators.Curation.cappedMixturePlan(
        t(s, dir, "documents"), col("source"),
        size(TextFunctions.tokens(col("text"))),
        c => floor(sqrt(c.cast("double")) * lit(1e6)),
        budget = 25000L)
    }),

    // EXACT-N deterministic sample (round-11): the fixed-count contract
    // ppsSample's expected-N draw can't honor — first 100 rows of the
    // md5(key) permutation via bucket-histogram threshold selection
    // (only the ONE boundary bucket pays a rank; no corpus sort). The
    // oracle is the flat ORDER BY md5 LIMIT — the gate proves the
    // threshold decomposition exact.
    "tdp_exact_sample" -> ((s, dir) => {
      graft.operators.Curation.exactSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), n = 100L)
        .orderBy(col("doc_id"))
    }),

    // Priority sampling (round-13): EXACT-n weighted sample with unbiased
    // subset-sum weights (Duffield-Lund-Thorup) — priority = w/u from the
    // md5-uniform, top-100 by priority, est_weight = max(w, tau) with tau
    // the 101st priority. The oracle re-derives through ONE flat global
    // window — independent of the engine's TakeOrdered decomposition. No
    // transcendentals anywhere (the u^(1/w) key of Efraimidis-Spirakis
    // would be libm-dependent); every op is an exactly-rounded IEEE
    // add/divide/max, so the sampled set AND weights hash bit-identically.
    "tdp_weighted_sample" -> ((s, dir) => {
      graft.operators.Curation.prioritySample(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("doc_id"), col("n_chars"), n = 100L)
        .orderBy(col("doc_id"))
    }),

    // Per-group priority sampling (round-13): exactly 10 docs per source
    // with the same unbiased estimator, per-group tau — the
    // window-partitioned shape that needs no driver merge (scales across
    // any number of groups). Oracle: one flat window per group, the
    // (k+1)-th in-group priority as tau_g.
    "tdp_weighted_sample_grp" -> ((s, dir) => {
      graft.operators.Curation.prioritySamplePerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("doc_id"), col("n_chars"), k = 10)
        .orderBy(col("doc_id"))
    }),

    // HARD per-source token quota (round-11): the "cap any single
    // domain" gate mixture planning can't enforce — exact running-total
    // ceiling in a deterministic md5 admission order, computed as a
    // two-level prefix sum (per-(source, hash-bucket) subtotals + a
    // <=256-row offset window per source) so no source ever occupies a
    // single window partition. The oracle re-derives the same totals
    // through ONE flat per-source window — the two sides agree only if
    // the bucketed decomposition is exact.
    "tdp_source_quota" -> ((s, dir) => {
      graft.operators.Curation.sourceQuota(
        t(s, dir, "documents"), col("source"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))), quotaTokens = 800L)
        .orderBy(col("source"), col("cum_tokens"), col("id"))
    }),

    // Leakage-safe temporal split with embargo (round-12): cutoff = the
    // EXACT 80th-percentile event time (bucket-histogram selection, no
    // global sort), a 2-hour embargo band dropped between train and
    // test — the purged time-series split. Pure projection after the
    // 1-row cutoff.
    "tdp_time_embargo" -> ((s, dir) => {
      graft.operators.Curation.timeEmbargoSplit(
        t(s, dir, "events"), col("event_id"), col("ts"),
        cutPercent = 80, embargoMicros = 2L * 3600L * 1000000L)
        .orderBy(col("id"))
    }),

    // Stratified k-fold assignment (round-12): per-source md5-rank mod k
    // via the sourceQuota two-level prefix sum — exactly balanced folds
    // per stratum, immune to the hash-order subsampling bias. The flat
    // per-source window oracle agrees only if the bucketed rank
    // decomposition is exact.
    "tdp_kfold" -> ((s, dir) => {
      graft.operators.Curation.kFoldSplit(
        t(s, dir, "documents"), col("source"), col("doc_id"), k = 5)
        .withColumnRenamed("stratum", "source")
        .orderBy(col("id"))
    }),

    // Curriculum staging: 4 difficulty tiers by exact interpolated
    // length quantiles — one percentile aggregation broadcast back as a
    // pure projection (the corpus never shuffles).
    "tdp_curriculum" -> ((s, dir) => {
      graft.operators.Curation.curriculumStages(
        t(s, dir, "documents"), length(col("text")), nStages = 4)
        .select(col("doc_id"), col("stage"))
        .orderBy(col("doc_id"))
    }),

    // Event-time OHLC downsample: per (event_type, hour bucket)
    // open/close by (ts, event_id) champion aggregates (min_by/max_by —
    // a plain hash agg, no per-bucket sort window).
    "txt_vocab_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.LanguageModel.vocabularyDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("text"), vocabSize = 25)
    }),

    // PMI collocations (phrase mining): bigram/unigram count aggs, the
    // minCount filter BEFORE the count joins, bounded TakeOrdered cut at
    // (pmi desc, w1, w2) — 6-dp-rounded PMI makes the ranking
    // deterministic cross-engine.
    "txt_pmi_bigrams" -> ((s, dir) => {
      graft.operators.LanguageModel.pmiCollocations(
        t(s, dir, "documents"), col("text"), minCount = 5L, topK = 25)
    }),

    // Ordered funnel (view -> click -> purchase): greedy earliest-
    // completion per user; one hash agg per step over a shrinking
    // frontier, each frontier lazily pinned.
    "txt_rrf_fusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bm = graft.operators.Search.bm25TopK(
        docs, col("doc_id"), col("text"), query = Seq("spark", "query", "fast"), k = 10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val bf = Similarity.bruteForceTopK(e, e.filter(col("id") === 3), k = 10)
        .select(col("neighbor_id").as("id"), col("rank"))
      graft.operators.Search.rrfFuse(bm, bf, "id", "rank", k = 60, topK = 10)
    }),

    // Hard-negative mining: exact cosine top-5 restricted to rows
    // PROVABLY of a different label (both known, unequal) — the
    // informative negatives for contrastive training.
    "tdp_negative_sample" -> ((s, dir) => {
      graft.operators.Curation.negativeSample(
        t(s, dir, "documents"), col("doc_id"), k = 3)
        .orderBy(col("anchor"), col("neg_rank"))
    }),

    // One-pass dataset profile of the documents table: dtype, nulls,
    // exact distincts, min/max per column (single aggregation pass).
    "tdp_pass_at_k" -> ((s, dir) => {
      graft.operators.Preference.passAtK(
        t(s, dir, "events").filter(col("value").isNotNull),
        col("user_id"), col("value") > 500.0, ks = Seq(1, 5, 10))
        .withColumnRenamed("task", "user_id")
    }),

    // k-anonymity audit (round-9) over derived quasi-identifiers
    // (event_type, day, value centile-band): class structure + violating
    // mass at k=5; exact BIGINTs, NULL is a real class value.
    "txt_oov_rate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.operators.Search.vocabulary(docs, col("text"), topK = 20)
        .select(col("token").as("term"))
      graft.operators.Search.oovRate(docs, col("doc_id"), col("text"), vocab)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Model training as aggregation: 2 full-batch gradient-descent
    // iterations of a logistic-regression language gate (predict lang=en
    // from [bias, token count, chars/100]), then sigma(w.x) inference
    // over every doc. Gradients are exact integer nano-unit sums, so the
    // trained weights — and therefore every score — replay bit-identically
    // in the DuckDB oracle's unrolled iterations.
    "txt_lr_train" -> ((s, dir) => {
      import graft.operators.QualityModel
      val docs = t(s, dir, "documents")
      def feats = Seq(
        lit(1.0),
        size(TextFunctions.tokens(col("text"))).cast("double"),
        col("n_chars").cast("double") / lit(100.0))
      val label = (col("lang") === "en").cast("int")
      val w = QualityModel.trainLogReg(docs, feats, label, iters = 2, lr = 0.5)
      docs.select(col("doc_id"), label.cast("long").as("y"),
        floor(QualityModel.logRegScore(feats, w) * lit(1e9) + lit(0.5))
          .cast("long").as("score_n"))
        .orderBy(col("doc_id"))
    }),

    // The composed SERVE path off persisted artifacts (round-13): the
    // TF-IDF corpus statistics and the bigram LM are written as parquet,
    // reloaded, and COMPOSED — near-dup partners flagged from the
    // reloaded stats, every document scored under the reloaded LM — the
    // exact job a production pipeline runs nightly without ever
    // re-deriving a model. The oracle composes the same two live SQL
    // re-derivations as subqueries, so a lossy artifact or a composition
    // bug reddens the row.
    "pipeline_artifact_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tDir = demoTempDir(s, "tfidf_serve")
      sharedTfidfModel(s, dir).save(tDir)
      val pairs = graft.operators.Dedup.tfidfNearDupFromStats(
        graft.operators.TfidfModel.load(s, tDir), threshold = 0.3, maxDf = 3)
      val lDir = demoTempDir(s, "lm_serve")
      graft.operators.LanguageModel.saveBigramLm(sharedLm(s, dir), lDir)
      val lm = graft.operators.LanguageModel.loadBigramLm(s, lDir)
      val scored = graft.operators.LanguageModel
        .scoreBigramLm(docs, col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
      val dups = pairs.select(col("id_b").as("doc_id")).distinct()
        .withColumn("_dup", lit(1))
      scored.join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"), col("_dup").isNotNull.as("is_dup_partner"),
          col("n_tokens"), col("lm_score"))
        .orderBy(col("doc_id"))
    }),

    // Classifier artifact round-trip (round-13): the trained weights
    // written as (idx, weight) parquet, reloaded, and inference runs off
    // the RELOADED vector — stored doubles are exact, so scores are
    // bit-identical (same live oracle as txt_lr_train).
    "txt_lr_reload" -> ((s, dir) => {
      import graft.operators.QualityModel
      val docs = t(s, dir, "documents")
      def feats = Seq(
        lit(1.0),
        size(TextFunctions.tokens(col("text"))).cast("double"),
        col("n_chars").cast("double") / lit(100.0))
      val label = (col("lang") === "en").cast("int")
      val w = QualityModel.trainLogReg(docs, feats, label, iters = 2, lr = 0.5)
      val outDir = demoTempDir(s, "logreg")
      QualityModel.saveWeights(s, w, outDir)
      val wBack = QualityModel.loadWeights(s, outDir)
      docs.select(col("doc_id"), label.cast("long").as("y"),
        floor(QualityModel.logRegScore(feats, wBack) * lit(1e9) + lit(0.5))
          .cast("long").as("score_n"))
        .orderBy(col("doc_id"))
    }),

    // SF-independent LM twin (same operator, inline corpus — OOV, backoff
    // and empty-doc paths all hit; see e_*_fx rationale).
    "txt_lm_score_fx" -> ((s, _) => {
      import s.implicits._
      val docs = Seq((1L, "a b a b c"), (2L, "a a a"), (3L, "c d a"), (4L, ""))
        .toDF("doc_id", "text")
      val lm = graft.operators.LanguageModel
        .trainBigramLm(docs, col("text"), vocabSize = 3, maxBigrams = 10)
      graft.operators.LanguageModel
        .scoreBigramLm(docs, col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer end-to-end on a deterministic fixture: distributed
    // word-frequency train (groupBy count + TakeOrdered cap) -> exact
    // driver merge loop -> broadcast-merges mapPartitions encode. The
    // merge loop is not SQL-expressible, so the oracle is a reviewed
    // VALUES pin (fixture-backed: SF-independent, always checked).
    "txt_bpe_encode" -> ((s, _) => {
      val corpus = bpeFixtureCorpus(s)
      val merges = graft.operators.Bpe.train(corpus, col("text"), nMerges = 8)
      graft.operators.Bpe.encode(corpus, col("id"), col("text"), merges)
        .select(col("id"), col("n_tokens"),
          array_join(col("tokens"), " ").as("token_str"))
        .orderBy(col("id"))
    }),

    // BPE artifact round-trip (round-13): the trained merge table written
    // to parquet (rank, left, right), reloaded, and the encode runs off
    // the RELOADED ranks — the production shape (train once, ship the
    // artifact). Rank order is stored explicitly, so the round trip is
    // exact: same fixture pin as txt_bpe_encode.
    "txt_bpe_reload" -> ((s, _) => {
      val corpus = bpeFixtureCorpus(s)
      val merges = graft.operators.Bpe.train(corpus, col("text"), nMerges = 8)
      val outDir = demoTempDir(s, "bpe")
      graft.operators.Bpe.saveMerges(s, merges, outDir)
      graft.operators.Bpe.encode(corpus, col("id"), col("text"),
        graft.operators.Bpe.loadMerges(s, outDir))
        .select(col("id"), col("n_tokens"),
          array_join(col("tokens"), " ").as("token_str"))
        .orderBy(col("id"))
    }),

    // SimHash document signatures (32-bit, multiset token weights).
    "txt_quality" -> ((s, dir) => {
      val m = TextFunctions.qualityMetrics(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), m.as("m"))
        .select(col("doc_id"), col("m.n_tokens").as("n_tokens"),
          col("m.mean_token_len").as("mean_token_len"),
          col("m.stopword_ratio").as("stopword_ratio"),
          col("m.punct_ratio").as("punct_ratio"),
          col("m.quality_score").as("quality_score"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style quality rules (round-9): every threshold a cross-
    // multiplied integer comparison over exact per-doc counts — no
    // division, no double, no rounding contract anywhere. minWords=5 so
    // the pass flag varies on the synthetic corpus.
    "txt_gopher_rules" -> ((s, dir) => {
      graft.operators.Curation.gopherRules(
        t(s, dir, "documents"), col("doc_id"), col("text"), minWords = 5)
        .withColumnRenamed("id", "doc_id")
    }),

    // Unicode NFC canonicalization (native codegen kernel) over the
    // corpus — two INDEPENDENT NFC implementations (java.text.Normalizer
    // vs DuckDB nfc_normalize) must agree on every document.
    "txt_normalize" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(TextFunctions.nfcNormalize(col("text"))).as("norm_md5"),
          (TextFunctions.nfcNormalize(col("text")) <=> col("text")).as("unchanged"))
        .orderBy(col("doc_id"))
    }),

    // Fixture twin with REAL normalization work: decomposed combining
    // sequences, an already-composed twin, the ASCII fast path, and the
    // U+212B angstrom-sign canonical singleton.
    "txt_normalize_fx" -> ((s, _) => {
      import s.implicits._
      graft.functions.GraftFunctions.ensureRegistered(s)
      val rows = Seq(
        (1L, "Café au lait"),   // e + combining acute -> é
        (2L, "Café au lait"),    // already composed: unchanged
        (3L, "plain ascii"),          // ascii fast path
        (4L, "Å ring"),         // A + combining ring -> Å
        (5L, "Å angstrom sign"), // singleton: -> Å
      ).toDF("id", "text")
      rows.select(col("id"),
        TextFunctions.nfcNormalize(col("text")).as("norm"),
        (TextFunctions.nfcNormalize(col("text")) === col("text")).as("unchanged"))
        .orderBy(col("id"))
    }),

    // Fixture twin of e_windowed_drift (events is the historically most
    // regeneration-prone table): hour 0 mirrors the reference mix
    // exactly (psi 0), hour 1 inverts it and adds an unknown type that
    // must fold into <other>.
    "txt_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.langIdHeuristic(col("text")).as("predicted"))
        .orderBy(col("doc_id"))
    }),

    // Intra-document repetition (duplicate 3-gram ratio — the Gopher-style
    // boilerplate reject signal).
    "txt_repetition" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.repetitionScore(col("text"), 3).as("rep3_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Per-source dataset card (round-9): the documentation artifact a
    // corpus release ships — size, token volume, language spread, Gopher
    // pass count and bigram diversity in ONE frame (three independent
    // aggregations joined on the |sources|-bounded key).
    "tdp_dataset_card" -> ((s, dir) => {
      import graft.operators.{Curation, Search}
      val docs = t(s, dir, "documents")
      val stats = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCountEstimate(col("text")).cast("long"))
          .as("total_tokens_est"),
        count_distinct(col("lang")).as("n_langs"))
      val gopher = Curation.gopherRules(docs, col("doc_id"), col("text"), minWords = 5)
        .select(col("id").as("doc_id"), col("pass"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(when(col("pass"), lit(1L)).otherwise(lit(0L))).as("n_gopher_pass"))
      val diversity = Search.distinctNgrams(docs, col("source"), col("text"), n = 2)
        .select(col("group").as("source"), col("distinct_ratio"))
      stats
        .join(gopher, Seq("source"), "left")
        .join(diversity, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("total_tokens_est"), col("n_langs"),
          coalesce(col("n_gopher_pass"), lit(0L)).as("n_gopher_pass"),
          col("distinct_ratio"))
        .orderBy(col("source"))
    }),

    // Sequence-length bucketing report (round-9): power-of-two buckets
    // over the BPE-ish token estimate — the padding-waste readout that
    // decides bucketed batching vs packing; pure integer CASE ladder.
    "tdp_length_buckets" -> ((s, dir) => {
      graft.operators.Curation.lengthBuckets(
        t(s, dir, "documents").select(
          TextFunctions.tokenCountEstimate(col("text")).as("n_tok")),
        col("n_tok"))
    }),

    // Pareto-frontier document selection (round-10): the skyline on
    // (maximize distinct-token types, minimize token count) — "most
    // lexical diversity per token budget". Corpus-scale shape: per-value
    // staircase aggregate, tiny single-partition window over the
    // staircase only, broadcast membership join back.
    "tdp_pareto_frontier" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      graft.operators.Curation.paretoFrontier(
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(array_distinct(toks)).as("n_types"),
            size(toks).as("n_tok")),
        col("doc_id"), col("n_types"), col("n_tok"))
        .select(col("id").as("doc_id"), col("d").as("n_types"), col("n").as("n_tok"))
        .orderBy(col("n_types").desc, col("doc_id"))
    }),

    // Score-monotonicity audit (round-10): does click-rate rise with
    // event value? Equal-population value bands via the staircase
    // pattern (per-value agg -> tiny cumulative window -> 10-row
    // rollup); exact-integer band rates; is_violation flags a band
    // whose rate drops. Scores quantized to cents upstream.
    "txt_source_percentile" -> ((s, dir) => {
      graft.operators.Curation.percentileNormalize(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer compression ratio (round-9): chars per estimated token,
    // per source — the "how expensive is this domain to tokenize"
    // readout; exact integer sums, one IEEE division.
    "txt_compression_ratio" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum(length(col("text")).cast("long")).as("total_chars"),
          sum(TextFunctions.tokenCountEstimate(col("text")).cast("long"))
            .as("total_tokens_est"))
        .withColumn("chars_per_token",
          when(col("total_tokens_est") > 0,
            col("total_chars").cast("double") / col("total_tokens_est").cast("double")))
        .orderBy(col("source"))
    }),

    // Per-source TF-IDF keyword profile (round-9): top-10 terms by
    // tf·round(ln((1+N)/(1+df)),6) — the 6-dp ln contract (pmi
    // precedent); the ranking window runs over the vocab table.
    "txt_tfidf_terms" -> ((s, dir) => {
      graft.operators.Search.tfidfTerms(
        t(s, dir, "documents"), col("source"), col("text"), topK = 10)
        .withColumnRenamed("group", "source")
    }),

    // Per-source distinct-2 diversity (round-9): distinct bigrams over
    // total bigram windows — the corpus-scope mode-collapse/template
    // readout; exact counts, one IEEE ratio.
    "txt_distinct_ngrams" -> ((s, dir) => {
      graft.operators.Search.distinctNgrams(
        t(s, dir, "documents"), col("source"), col("text"), n = 2)
        .withColumnRenamed("group", "source")
    }),

    // Exact-duplicate mass by source (round-9): what fraction of each
    // source's rows carry a corpus-wide duplicated fingerprint — the
    // per-source curation dashboard number behind "which feed is
    // recycling content"; exact counts, one IEEE ratio.
    "txt_ngram_novelty" -> ((s, dir) => {
      graft.operators.Search.ngramNovelty(
        t(s, dir, "documents"), col("doc_id"), col("text"), n = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Document fingerprints: normalized md5 + order-sensitive rolling hash.
    "txt_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.normalizedFingerprint(col("text")).as("norm_fp"),
          TextFunctions.rollingHash(col("text")).as("rolling_hash"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal binary-column plumbing: opaque payload + portable digest.
    "tdp_scd2_merge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val open = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("key"), col("text").as("value"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val closedHist = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("key"), concat(lit("old "), col("text")).as("value"),
          lit(-100L).as("valid_from"), lit(0L).as("valid_to"))
      val changes = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("key"),
          when(col("doc_id") % 5 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v2"))).as("value"),
          lit(100L).as("ts"),
          when(col("doc_id") % 7 === 0, lit("delete")).otherwise(lit("upsert")).as("op"))
      graft.operators.Scd.scd2Merge(open.unionByName(closedHist), changes)
        .orderBy(col("key"), col("valid_from"))
    }),

    "txt_token_estimate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCountEstimate(col("text")).cast("long").as("n_tokens_est"))
        .orderBy(col("doc_id"))
    }),

    // Embedding-cosine near-dup pairs via random-hyperplane LSH buckets —
    // the 100 TB dedup path: candidates only from equal 8-bit signatures.
    "txt_bm25_topk" -> ((s, dir) => {
      graft.operators.Search.bm25TopK(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        query = Seq("spark", "query", "fast"), k = 10)
    }),

    // Retrieval-evaluation metrics over the BM25 run: qrels = documents
    // containing ALL three query terms (binary contains-all relevance),
    // run = the same top-10 the txt_bm25_topk oracle re-derives, ranked
    // (score desc, id). MRR/recall are single exact divisions; the log2
    // gains ride round-then-decimal; nDCG ships as BIGINT micro units.
    // The rank window is bounded by the k=10 run cut.
    "txt_retrieval_metrics" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val run = graft.operators.Search.bm25TopK(
        docs, col("doc_id"), col("text"),
        query = Seq("spark", "query", "fast"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)))
        .select(lit(1L).as("query_id"), col("id").as("doc_id"), col("rank"))
      val qrels = docs
        .select(col("doc_id"), graft.operators.Search.terms(col("text")).as("_t"))
        .filter(array_contains(col("_t"), "spark") && array_contains(col("_t"), "query")
          && array_contains(col("_t"), "fast"))
        .select(lit(1L).as("query_id"), col("doc_id"))
      graft.operators.Search.retrievalMetrics(run, qrels, k = 10)
    }),

    // Inline-fixture twin (family-survival policy): multi-query edge
    // cases — a partial-hit query, a judged query the retriever missed
    // entirely (must still report zeros), a query with more relevant
    // docs than k (idcg caps at k), and an UNJUDGED run query (must not
    // appear: metrics against no judgments are undefined).
    "txt_retrieval_metrics_fx" -> ((s, _) => {
      import s.implicits._
      val runs = Seq(
        (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
        (3L, 30L, 1L), (3L, 31L, 2L),
        (4L, 40L, 1L),
      ).toDF("query_id", "doc_id", "rank")
      val qrels = Seq(
        (1L, 11L), (1L, 99L),
        (2L, 20L),
        (3L, 30L), (3L, 31L), (3L, 32L), (3L, 33L),
      ).toDF("query_id", "doc_id")
      graft.operators.Search.retrievalMetrics(runs, qrels, k = 3)
    }),

    // Length-bias diagnostic: Spearman rho between the BM25 top-10
    // ranking and the SAME docs ranked by raw length — exact integer
    // Σd²/n(n²-1) with one trailing division. The re-rank windows are
    // bounded by the k=10 run cut.
    "txt_rank_correlation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val run = graft.operators.Search.bm25TopK(
        docs, col("doc_id"), col("text"),
        query = Seq("spark", "query", "fast"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("id"), col("rank"))
        // the 10-row run feeds BOTH ranking legs (and each leg twice in
        // the correlation join): pin it once or the full BM25 retrieval
        // pass re-executes per read
        .transform(graft.operators.Pin.lazyPin)
      val byLen = run
        .join(docs.select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n_chars").desc, col("id").asc)))
        .select(col("id"), col("rank"))
      graft.operators.Search.rankCorrelation(run, byLen, "id")
    }),

    // Substring-dedup removal: documents rebuilt without their duplicated
    // 5-gram spans; span-free docs pass through untouched.
    "tdp_remove_dup_spans" -> ((s, dir) => {
      graft.operators.Curation.removeDuplicateSpans(
        t(s, dir, "documents"), col("doc_id"), col("text"), k = 5)
        .orderBy(col("id"))
    }),

    // ExactSubstr APPLY step (round-11): excise every cross-document
    // duplicated span from all but its canonical first occurrence — one
    // copy of each duplicated substring survives the corpus (the Lee et
    // al. dedup semantics; tdp_remove_dup_spans by contrast scrubs every
    // occurrence).
    "tdp_substring_dedup_apply" -> ((s, dir) => {
      graft.operators.Curation.applySubstringDedup(
        t(s, dir, "documents"), col("doc_id"), col("text"), k = 5)
        .orderBy(col("id"))
    }),

    // Span-level decontamination (round-10): WHERE the benchmark leaks
    // into each training document (token offsets to excise), not just
    // which documents to drop — the exact-substring complement to the
    // document-level tdp_decontaminate flag. Same %20 benchmark split.
    "tdp_decon_spans" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      graft.operators.Curation.decontaminateSpans(
        d.filter(col("id") % 20 =!= 0), col("id"), col("text"),
        d.filter(col("id") % 20 === 0), col("text"), k = 5)
        .orderBy(col("id"), col("span_start"))
    }),

    // Deterministic hash split: 80/10/10 train/val/test, pure projection.
    "tdp_hash_split" -> ((s, dir) => {
      graft.operators.Curation.hashSplit(
        t(s, dir, "documents").select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy(col("doc_id"))
    }),

    // Split-leakage audit: near-dup pairs (the dd_minhash_lsh derivation)
    // crossing the 80/10/10 hash-split boundaries — the doc-level
    // train/test contamination check a group-level overlap matrix can't
    // see. One broadcast of the tiny split assignment per pair side;
    // ordered (split_a <= split_b) so each unordered pairing counts once.
    "tdp_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedLshPairs(s, dir)
      val splits = graft.operators.Curation.hashSplit(
        docs.select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      pairs
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("_sa")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("_sb")), "id_b")
        .select(least(col("_sa"), col("_sb")).as("split_a"),
          greatest(col("_sa"), col("_sb")).as("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("crosses_split", col("split_a") =!= col("split_b"))
        .orderBy(col("split_a"), col("split_b"))
    }),

    // Leakage-SAFE split (round-11): the fix for what tdp_split_leakage
    // measures — every near-dup connected component lands wholly in one
    // split (md5 draw keyed by the component representative, not the
    // doc), singletons split exactly as hashSplit would. Zero
    // cross-split near-dup pairs by construction.
    "tdp_component_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedLshPairs(s, dir)
      graft.operators.Curation.componentSplit(
        docs, col("doc_id"), pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy(col("id"))
    }),

    // Snapshot diff between two corpus versions: only (id, md5) shuffles,
    // never document bodies. The two versions derive deterministically
    // from the documents table (drop-by-modulus + an edit marker).
    "tdp_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [edited]")))
            .otherwise(col("text")).as("text"))
      graft.operators.Curation.snapshotDiff(v1, v2, "doc_id", md5(col("text")))
        .orderBy(col("id"))
    }),

    // KMV distinct sketches: O(k)-state cardinality estimates whose
    // portable md5-prefix hash lets DuckDB re-derive the k-min set AND
    // the estimator bit-identically — an approximate operator with an
    // exact oracle. user_id/event_id exceed k (true estimate path);
    // event_type undershoots it (sketch degenerates to the exact count).
    "tdp_sketch_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Sketches.kmvDistinct(ev, "event_id", col("event_id"), 64)
        .unionByName(graft.operators.Sketches.kmvDistinct(ev, "event_type", col("event_type"), 64))
        .unionByName(graft.operators.Sketches.kmvDistinct(ev, "user_id", col("user_id"), 64))
        .orderBy(col("column_name"))
    }),

    // Model inference as columns: hashed linear quality scorer (fastText
    // shape) as a zero-shuffle projection — plan-time literal weight
    // table, exact long fold over the token array.
    "txt_quality_model" -> ((s, dir) => {
      graft.operators.QualityModel
        .scoreDocs(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("id"))
    }),

    // Calibrated quality ensemble (round-8): heuristic + hashed-model +
    // bigram-LM signals, each quantile-normalized to its corpus CDF, in
    // ONE corpus scan (the heuristic/model projections ride the LM
    // scorer's carry columns).
    "txt_quality_ensemble" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = sharedLm(s, dir)
      graft.operators.QualityModel
        .ensembleQuality(docs, col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // The ensemble score driven through the dq calibration report — the
    // reliability readout a quality gate is tuned against (label: the
    // heuristic rule fires fully, i.e. q_heuristic = 1.0).
    "txt_ensemble_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = sharedLm(s, dir)
      val scored = graft.operators.QualityModel
        .ensembleQuality(docs, col("doc_id"), col("text"), lm)
      graft.operators.DataQuality.calibrationReport(
        scored, col("ensemble"), col("q_heuristic") >= 1.0,
        lo = 0.0, hi = 1.0, buckets = 10)
    }),

    // The ensemble as an actual GATE: per-source pass rates at a 0.5
    // ensemble threshold — the per-ingest report a curation pipeline
    // publishes when the calibrated score starts filtering.
    "tdp_quality_gate_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = sharedLm(s, dir)
      val scored = graft.operators.QualityModel
        .ensembleQuality(docs, col("doc_id"), col("text"), lm)
        .select(col("id").as("doc_id"), col("ensemble"))
      docs.select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("ensemble").isNotNull, 1L).otherwise(0L)).as("n_scored"),
          sum(when(col("ensemble") >= 0.5, 1L).otherwise(0L)).as("n_pass"))
        .withColumn("pass_rate",
          col("n_pass").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("source"))
    }),

    // CCNet-style perplexity bucketing: head/middle/tail by interpolated
    // nll quantiles (thresholds broadcast; corpus shuffles once, in the
    // LM scorer itself).
    "txt_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = sharedLm(s, dir)
      graft.operators.LanguageModel
        .perplexityBuckets(docs, col("doc_id"), col("text"), lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Corpus-frequency boilerplate scrub at SF scale. The SF corpus is
    // single-line word soup, so the separator-unit degenerates to the
    // word (corpus-frequency token removal) — identical semantics and
    // plan shape as the newline case; txt_boilerplate_fx exercises the
    // real line-structured behavior.
    "txt_boilerplate_scrub" -> ((s, dir) => {
      graft.operators.Curation.removeBoilerplateLines(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        minDocFrac = 0.8, sep = " ")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Line-structured boilerplate fixture: a banner in 4/4 docs and a
    // footer in 3/4 exceed ceil(0.6 * 4) = 3; doc 4 is fully boilerplate
    // and must keep its row with empty text.
    "txt_boilerplate_fx" -> ((s, _) => {
      import s.implicits._
      val docs = Seq(
        (1L, "COOKIE BANNER\nalpha beta\nfooter"),
        (2L, "COOKIE BANNER\ngamma delta\nfooter"),
        (3L, "COOKIE BANNER\nepsilon zeta"),
        (4L, "COOKIE BANNER\nfooter"),
      ).toDF("id", "text")
      graft.operators.Curation
        .removeBoilerplateLines(docs, col("id"), col("text"), minDocFrac = 0.6)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Deterministic k-per-group sampling: smallest-portable-hash rows of
    // each language (fixed-count complement of the fraction-based
    // stratified sample; rerun/engine reproducible).
    "tdp_sample_per_group" -> ((s, dir) => {
      graft.operators.Curation.samplePerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        Seq(col("lang")), col("doc_id"), k = 5)
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Fixed-memory histogram quantiles on document length: O(span/step)
    // state vs the exact percentile's full-width sort; midpoint within
    // step/2 of a true quantile element. Integral bucket math replays
    // bit-identically in DuckDB.
    "tdp_quantile_sketch" -> ((s, dir) => {
      graft.operators.Sketches.histogramQuantiles(
        t(s, dir, "documents"), col("n_chars"), step = 200L,
        qs = Seq(0.5, 0.9, 0.99))
        .orderBy(col("q"))
    }),

    // Z-order layout: quantize (user_id, event time) and bit-interleave
    // into the Morton value a write-side ORDER BY would use — every file
    // then carries a tight min/max envelope on BOTH columns for parquet
    // zone-map pruning. Pure integer shift/mask arithmetic, re-derived
    // operator-for-operator by the DuckDB oracle.
    "tdp_zorder" -> ((s, dir) => {
      val tsMin = 1704067200000000L // 2024-01-01T00:00:00Z in micros
      val tsMax = 1735689600000000L // 2025-01-01T00:00:00Z
      val z = graft.operators.ZOrder.zValue(
        Seq(col("user_id"), unix_micros(col("ts").cast("timestamp"))),
        Seq((0L, 100000L), (tsMin, tsMax)), bits = 8)
      t(s, dir, "events")
        .select(col("event_id"), z.as("z"))
        .orderBy(col("event_id"))
    }),

    // Per-group KMV via the native TypedImperativeAggregate: partial
    // buffers cap at k longs per (partition, group) — the bounded
    // grouped sketch collect_set cannot express. Same portable hash, so
    // DuckDB re-derives every group's sketch bit-identically.
    "tdp_sketch_by_group" -> ((s, dir) => {
      graft.operators.Sketches.kmvDistinctByGroup(
        t(s, dir, "events"), Seq(col("event_type")), col("user_id"), 32)
        .orderBy(col("event_type"))
    }),

    // Exact heavy-hitter diagnostic (partial agg + TakeOrdered — no
    // global sort): the report that decides where salting is needed.
    "tdp_heavy_hitters" -> ((s, dir) => {
      graft.operators.Skew.heavyHitters(t(s, dir, "events"), col("user_id"), 10)
        .orderBy(col("n").desc, col("key").asc)
    }),

    // Native LSH-style spectra clustering (the MaraCluster-replacement
    // scale extension, SURVEY §7.5): spectra synthesized deterministically
    // from the embeddings table — planted near-copies at +1000 (same
    // precursor slot, +0.01 m/z) and second-generation copies at +2000
    // (+0.03 m/z: within tol of the FIRST copy but NOT of the base, so the
    // 3-member clusters close only transitively through connected
    // components, and the precursor gate provably cuts a >=0.95-cosine
    // pair). Integer-valued intensities make every dot/norm sum exact, so
    // the cosine threshold is engine-independent.
    "tdp_build_corpus" -> ((s, dir) => {
      graft.operators.CorpusPipeline.buildCorpus(
        t(s, dir, "documents").select(col("doc_id").as("id"), col("text")),
        graft.operators.CorpusPipeline.CorpusConfig(
          minQuality = 0.5, nearDupThreshold = 0.6))
        .corpus
        .orderBy(col("id"))
    }),

    // Per-source corpus report card: doc counts, EXACT token totals (the
    // long-typed estimate sums without float drift), language spread, and
    // quality-gate pass counts — the rollup a training-data pipeline
    // publishes per ingest source. One shuffle (the groupBy); quality and
    // token expressions are the same pinned columns txt_quality /
    // txt_token_estimate verify, so the oracle is a full SQL
    // re-derivation, not an expected table.
    "tdp_corpus_stats" -> ((s, dir) => {
      val m = TextFunctions.qualityMetrics(col("text"))
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          TextFunctions.tokenCountEstimate(col("text")).cast("long").as("_tok"),
          m.getField("quality_score").as("_q"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("_tok")).as("total_tokens_est"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("_q") >= 0.7, 1L).otherwise(0L)).as("n_quality_pass"),
        )
        .withColumn("avg_chars", col("total_chars").cast("double") / col("n_docs"))
        .orderBy(col("source"))
    }),

    // Benchmark decontamination: corpus docs sharing any 3-gram shingle
    // with the "benchmark" slice (every 20th doc) are flagged — the
    // train-set hygiene gate, one broadcast semi-join on the shingle.
    "tdp_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      graft.operators.Curation.decontaminate(
        d.filter(col("id") % 20 =!= 0), d.filter(col("id") % 20 === 0), n = 3)
        .orderBy(col("id"))
    }),

    // Per-source contamination rate with Wilson 95% bounds (round-10):
    // the decontaminate flags rolled up per source through rateWithWilson
    // — "which ingestion source leaks benchmark text, with uncertainty".
    // Pure composition of two verified operators.
    "tdp_contamination_rate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val flags = graft.operators.Curation.decontaminate(
        d.filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id").as("id"), col("text")),
        d.filter(col("doc_id") % 20 === 0)
          .select(col("doc_id").as("id"), col("text")), n = 3)
      graft.operators.DataQuality.rateWithWilson(
        flags.join(d.select(col("doc_id").as("id"), col("source")), "id"),
        col("source"), col("contaminated"))
    }),

    // Fuzzy decontamination: MinHash-banded cross-corpus near-dup flags —
    // catches the paraphrased contamination exact shingle overlap misses.
    // Train = docs not in the benchmark slice; benchmark = every 20th doc
    // (dup/near-dup pairs planted in the corpus straddle the split).
    "tdp_fuzzy_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      graft.operators.Curation.fuzzyDecontaminate(
        d.filter(col("id") % 20 =!= 0), d.filter(col("id") % 20 === 0),
        shingleN = 3, numHashes = 16, numBands = 4, threshold = 0.5)
        .orderBy(col("id"))
    }),

    // Deterministic sharded sequence packing: greedy token-budget bins in
    // id order per md5 shard (the pre-tokenization batching step).
    "tdp_pack_sequences" -> ((s, dir) => {
      graft.operators.Curation.packSequences(
        t(s, dir, "documents"), col("doc_id"),
        TextFunctions.tokenCountEstimate(col("text")).cast("long"),
        tokenBudget = 2048, numShards = 64)
        .select(col("doc_id"), col("shard"), col("pack"))
        .orderBy(col("doc_id"))
    }),

    // Dedup-safe tokenizer-aware training-shard plan (round-8): exact
    // dedup -> epoch-1 shuffle order -> round-robin shards -> greedy
    // token packs, rolled up per (shard, pack). The hash breaks if the
    // dedup survivor set, the epoch permutation, the shard assignment,
    // or the packing boundaries drift.
    "tdp_training_shards" -> ((s, dir) => {
      graft.operators.Curation.trainingShardPlan(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        TextFunctions.tokenCountEstimate(col("text")).cast("long"),
        epoch = 1, tokenBudget = 2048, numShards = 8)
        .groupBy(col("shard"), col("pack"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
          min(col("shuffle_pos")).as("first_pos"))
        .orderBy(col("shard"), col("pack"))
    }),

    // PII redaction over documents with deterministic injected PII (the
    // synthetic corpus has none): email/IPv4/phone placeholders + counts.
    "tdp_pii_scrub" -> ((s, dir) => {
      val withPii = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1 (555) 010-"),
        lpad(col("doc_id").cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".1"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.Curation.redactPii(withPii).as("redacted"),
          coalesce(regexp_count(withPii, lit(graft.operators.Curation.EmailRe)), lit(0))
            .cast("long").as("n_emails"),
          coalesce(regexp_count(withPii, lit(graft.operators.Curation.Ipv4Re)), lit(0))
            .cast("long").as("n_ips"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic hash-stratified sampling: per-language keep fractions
    // via a portable md5 uniform — reproducible lineage, pure filter.
    "tdp_stratified_sample" -> ((s, dir) => {
      graft.operators.Curation.stratifiedSample(
        t(s, dir, "documents"), col("lang"), col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
    }),

    // Incremental cross-batch dedup: new docs (id >= 250) against the
    // standing corpus (id < 250); bloom prefilter + exact anti-join —
    // result is exactly the plain anti-join (oracle). Every 5th batch doc
    // borrows a seen doc's text (deterministic planted dups — the raw
    // tables have no cross-boundary duplicates, so without the injection
    // the oracle could not catch an anti-join that drops nothing).
    "tdp_mixture_plan" -> ((s, dir) => {
      graft.operators.Curation.mixturePlan(
        t(s, dir, "documents"), col("source"), length(col("text")),
        Map("src1" -> 0.6, "src2" -> 0.4, "src3" -> 0.0), tokenBudget = 10000L)
        .orderBy(col("source"))
    }),

    // Mixture sampling to a token budget: plan broadcast back as a pure
    // deterministic filter (md5-uniform selection, corpus never shuffled).
    "tdp_mixture_sample" -> ((s, dir) => {
      graft.operators.Curation.mixtureSample(
        t(s, dir, "documents"), col("source"), col("doc_id"), length(col("text")),
        Map("src1" -> 0.6, "src2" -> 0.4, "src3" -> 0.0), tokenBudget = 10000L)
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    // Temperature mixture plan (alpha-sampling, alpha=0.5): corpus
    // shares^alpha renormalized — big sources down-, small sources
    // up-weighted; all arithmetic rounds/decimal-sums for parity.
    "tdp_temperature_plan" -> ((s, dir) => {
      graft.operators.Curation.temperatureMixturePlan(
        t(s, dir, "documents"), col("source"), length(col("text")),
        alpha = 0.5, tokenBudget = 10000L)
        .orderBy(col("source"))
    }),

    // The sampled corpus under the alpha=0.5 plan (plan broadcast back
    // as a pure deterministic filter).
    "tdp_temperature_mixture" -> ((s, dir) => {
      graft.operators.Curation.temperatureMixtureSample(
        t(s, dir, "documents"), col("source"), col("doc_id"), length(col("text")),
        alpha = 0.5, tokenBudget = 10000L)
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    // Corpus length distribution: exact interpolated percentiles per
    // language (single hash-agg; the sort is per-group inside the agg
    // buffer, no global sort).
    "txt_length_quantiles" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), length(col("text")).cast("double").as("len"))
        .groupBy(col("lang"))
        .agg(
          percentile(col("len"), lit(0.5)).as("p50"),
          percentile(col("len"), lit(0.9)).as("p90"),
          percentile(col("len"), lit(0.99)).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // Context-window chunking: fixed-token windows with overlap, pure
    // projection + explode (no shuffle; offsets are arithmetic).
    "tdp_chunk_documents" -> ((s, dir) => {
      graft.operators.Curation.chunkDocuments(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), col("text"), chunkSize = 50, overlap = 10)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Deterministic epoch shuffle: md5("<id>:<epoch>") order key +
    // range-sort global index (no single-task window).
    "tdp_epoch_shuffle" -> ((s, dir) => {
      graft.operators.Curation.epochShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), epoch = 3)
        .select(col("doc_id"), col("source"), col("shuffle_pos"))
        .orderBy(col("shuffle_pos"))
    }),

    // Unigram-LM (SentencePiece-shape) tokenizer, Viterbi inference
    // (round-12): fixture-trained vocabulary (the distributed word-count
    // head runs in-query; hard-EM drives the bounded table driver-side),
    // min-cost segmentation of the SF documents under quantized integer
    // costs. Deterministic end to end -> VALUES pin; the greedy twin
    // below is the live-oracle anchor for the shared vocabulary.
    "txt_unigram_encode" -> ((s, dir) => {
      val model = sharedUnigramModel(s)
      graft.operators.Unigram.encode(
        t(s, dir, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), model, viterbi = true)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy(col("doc_id"))
    }),

    // Unigram artifact round-trip (round-13): the fixture-trained
    // vocabulary written as a parquet (piece, cost, max_piece_len)
    // table, reloaded, and the Viterbi encode runs off the RELOADED
    // model. Costs are integer-quantized, so the round trip is exact by
    // construction — same pin as txt_unigram_encode, same live Viterbi
    // rederive.
    "txt_unigram_reload" -> ((s, dir) => {
      val outDir = demoTempDir(s, "unigram")
      graft.operators.Unigram.saveModel(s, sharedUnigramModel(s), outDir)
      val model = graft.operators.Unigram.loadModel(s, outDir)
      graft.operators.Unigram.encode(
        t(s, dir, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), model, viterbi = true)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy(col("doc_id"))
    }),

    // Greedy longest-match inference (the WordPiece rule) under the SAME
    // fixture-trained unigram vocabulary: the left-to-right functional
    // iteration is replayed LIVE by a recursive-CTE oracle whose piece
    // list is interpolated from the very model the engine trains — if
    // training OR segmentation drifts by one token, the hash breaks.
    "txt_wordpiece_encode" -> ((s, dir) => {
      val model = sharedUnigramModel(s)
      graft.operators.Unigram.encode(
        t(s, dir, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), model, viterbi = false)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy(col("doc_id"))
    }),
  )

  /** The deterministic BPE training fixture shared by txt_bpe_encode and
    * its artifact-round-trip twin txt_bpe_reload. */
  private def bpeFixtureCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"),
      (5L, "the lowest newest widest low"),
    ).toDF("id", "text")
  }

  // reviewed pin (gen_values_oracle): newest (7 occurrences, the most
  // frequent word) merges to one token; widest only reaches est</w>
  // before the 8-merge budget ends; lowest composes low + est</w>.
  // Shared by txt_bpe_encode AND txt_bpe_reload (the reloaded merge
  // table restores rank order exactly, so both must pin identically).
  private val BpeEncodeSql: String =
    """SELECT c0::BIGINT AS "id", c1::BIGINT AS "n_tokens", c2::VARCHAR AS "token_str"
      |FROM (VALUES
      |  (1, 10, 'low </w> low </w> low </w> low </w> low </w>'),
      |  (2, 8, 'low e r </w> low e r </w>'),
      |  (3, 6, 'newest</w> newest</w> newest</w> newest</w> newest</w> newest</w>'),
      |  (4, 12, 'w i d est</w> w i d est</w> w i d est</w>'),
      |  (5, 13, 't h e </w> low est</w> newest</w> w i d est</w> low </w>'))
      |AS t(c0, c1, c2) ORDER BY "id"""".stripMargin

  private val oracleSqlBase: Map[String, String] = Map(
    "txt_wordpiece_encode" -> {
      val pieces = unigramFixtureModel.vocab.toSeq.sorted
        .map(p => "'" + p.replace("'", "''") + "'").mkString(", ")
      s"""WITH RECURSIVE vocab(piece) AS (SELECT unnest([$pieces])),
         |d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |  FROM documents WHERE doc_id < 200),
         |words AS (SELECT DISTINCT unnest(t) AS word FROM d),
         |seg(word, pos, tok) AS (
         |  SELECT word, 1::BIGINT,
         |    coalesce((SELECT piece FROM vocab
         |              WHERE substr(word, 1, len(piece)) = piece
         |              ORDER BY len(piece) DESC LIMIT 1), substr(word, 1, 1))
         |  FROM words
         |  UNION ALL
         |  SELECT word, pos + len(tok),
         |    coalesce((SELECT piece FROM vocab
         |              WHERE substr(word, CAST(pos + len(tok) AS INT), len(piece)) = piece
         |              ORDER BY len(piece) DESC LIMIT 1),
         |             substr(word, CAST(pos + len(tok) AS INT), 1))
         |  FROM seg WHERE pos + len(tok) <= len(word)),
         |wt AS (
         |  SELECT word, string_agg(tok, ' ' ORDER BY pos) AS toks,
         |    count(*)::BIGINT AS ntok
         |  FROM seg GROUP BY word),
         |docw AS (
         |  SELECT doc_id, i, t[i] AS word
         |  FROM d, LATERAL unnest(generate_series(1, len(t))) AS g(i)),
         |agg AS (
         |  SELECT doc_id, sum(ntok)::BIGINT AS n_tokens,
         |    string_agg(toks, ' ' ORDER BY i) AS tokens_str
         |  FROM docw JOIN wt USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
         |  coalesce(a.tokens_str, '') AS tokens_str
         |FROM d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "txt_unigram_encode" -> PinnedOracles.sql.getOrElse("txt_unigram_encode",
      "SELECT NULL AS missing_pin_txt_unigram_encode"),

    // identical output to txt_unigram_encode by the exact-artifact
    // round-trip argument; own machine pin so per-SF overlays apply.
    "txt_unigram_reload" -> PinnedOracles.sql.getOrElse("txt_unigram_reload",
      "SELECT NULL AS missing_pin_txt_unigram_reload"),

    "txt_vocabulary" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |    AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    // CMS join-size re-derivation: both sketches rebuilt as (r, bucket)
    // count tables, inner product per row as an exact BIGINT sum of
    // products (zero buckets contribute zero, so joining only the
    // co-occupied buckets is identical to the engine's full-width fold),
    // min over the depth rows, next to the true join count.
    "tdp_cms_join_size" ->
      """WITH consts AS (SELECT * FROM (VALUES
        |  (0, 1::BIGINT, 0::BIGINT), (1, 1777::BIGINT, 97::BIGINT),
        |  (2, 7919::BIGINT, 1009::BIGINT), (3, 104729::BIGINT, 30011::BIGINT))
        |  AS t(r, a, b)),
        |ha AS (SELECT ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT AS h
        |       FROM orders WHERE o_orderkey IS NOT NULL),
        |hb AS (SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT AS h
        |       FROM lineitem WHERE l_orderkey IS NOT NULL),
        |ba AS (SELECT c.r AS r,
        |         ((c.a * (h % 2147483647) + c.b) % 2147483647) % 65536 AS bk,
        |         count(*)::BIGINT AS cnt
        |       FROM ha CROSS JOIN consts c GROUP BY c.r, bk),
        |bb AS (SELECT c.r AS r,
        |         ((c.a * (h % 2147483647) + c.b) % 2147483647) % 65536 AS bk,
        |         count(*)::BIGINT AS cnt
        |       FROM hb CROSS JOIN consts c GROUP BY c.r, bk),
        |er AS (SELECT ba.r, sum(ba.cnt * bb.cnt)::BIGINT AS ip
        |       FROM ba JOIN bb ON bb.r = ba.r AND bb.bk = ba.bk GROUP BY ba.r),
        |es AS (SELECT min(coalesce(e.ip, 0))::BIGINT AS est
        |       FROM consts c LEFT JOIN er e ON e.r = c.r),
        |ex AS (SELECT count(*)::BIGINT AS exact
        |       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
        |SELECT es.est, ex.exact, es.est::DOUBLE / ex.exact AS ratio
        |FROM es CROSS JOIN ex""".stripMargin,

    // Canonical-member re-derivation (round-10): the shared LSH pair
    // CTEs + the unrolled BIGINT PageRank chain + recursive min-label
    // components, one row_number per component at (pr desc, id).
    "tdp_graph_rank" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
         |      ELSE [array_to_string(t, ' ')] END)) AS shingle
         |  FROM toks),
         |hs AS (
         |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
         |  FROM hs CROSS JOIN (SELECT * FROM (VALUES $minhashCoeffs) AS t(i, a, b)) co
         |  GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
         |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
         |  FROM cand
         |  JOIN mh ma ON ma.doc_id = id_a
         |  JOIN mh mb ON mb.doc_id = id_b AND mb.i = ma.i
         |  GROUP BY id_a, id_b),
         |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |sym AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT id_a AS src, id_b AS dst FROM pairs
         |    UNION ALL SELECT id_b, id_a FROM pairs)
         |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
         |nodes AS (SELECT src AS id, count(*)::BIGINT AS deg FROM sym GROUP BY src),
         |st AS (SELECT count(*)::BIGINT AS n FROM nodes),
         |p0 AS (SELECT id, deg, 1000000000000 // n AS pr FROM nodes CROSS JOIN st),
         |c1 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
         |       FROM p0 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
         |p1 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
         |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
         |       FROM p0 p LEFT JOIN c1 c ON c.id = p.id CROSS JOIN st),
         |c2 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
         |       FROM p1 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
         |p2 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
         |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
         |       FROM p1 p LEFT JOIN c2 c ON c.id = p.id CROSS JOIN st),
         |c3 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
         |       FROM p2 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
         |p3 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
         |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
         |       FROM p2 p LEFT JOIN c3 c ON c.id = p.id CROSS JOIN st)
         |SELECT id, pr::BIGINT AS rank_fp
         |FROM p3 ORDER BY rank_fp DESC, id""".stripMargin,

    // 2-core re-derivation: the shared LSH pair chain symmetrized, then
    // 64 synchronous peel rounds through an iter-stamped recursive CTE
    // (UNION ALL — a shrinking set under UNION-distinct would terminate
    // after one round; the iter column keeps fixpoint rounds "new" until
    // the cap, and `iter = 64` is empty iff the core peeled to nothing).
    // Final degrees counted inside the surviving set, exact BIGINTs.
    "tdp_graph_kcore" ->
      (lshPairCtes + ",\n" +
        """sym AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT id_a AS src, id_b AS dst FROM pairs
          |    UNION ALL SELECT id_b, id_a FROM pairs)
          |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
          |core AS (
          |  WITH RECURSIVE alive(iter, id) AS (
          |    SELECT 0, src FROM (SELECT DISTINCT src FROM sym)
          |    UNION ALL
          |    SELECT x.iter, x.id FROM (
          |      SELECT a.iter + 1 AS iter, e.src AS id, count(*) AS deg
          |      FROM alive a JOIN sym e ON e.dst = a.id
          |      WHERE a.iter < 64
          |      GROUP BY a.iter + 1, e.src) x
          |    WHERE x.deg >= 2)
          |  SELECT id FROM alive WHERE iter = 64)
          |SELECT f.id AS id, count(*)::BIGINT AS core_degree
          |FROM core f JOIN sym e ON e.src = f.id JOIN core f2 ON f2.id = e.dst
          |GROUP BY f.id
          |ORDER BY f.id""".stripMargin),

    // Triangle re-derivation: the graph_rank pair CTEs, then the same
    // degree-ordered orientation, apex wedge join and closing-edge match
    // — exact BIGINT counts end to end.
    "tdp_graph_triangles" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
         |      ELSE [array_to_string(t, ' ')] END)) AS shingle
         |  FROM toks),
         |hs AS (
         |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
         |  FROM hs CROSS JOIN (SELECT * FROM (VALUES $minhashCoeffs) AS t(i, a, b)) co
         |  GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
         |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
         |  FROM cand
         |  JOIN mh ma ON ma.doc_id = id_a
         |  JOIN mh mb ON mb.doc_id = id_b AND mb.i = ma.i
         |  GROUP BY id_a, id_b),
         |canon AS (SELECT id_a AS a, id_b AS b FROM est WHERE est_jaccard >= 0.5),
         |deg AS (
         |  SELECT id, count(*)::BIGINT AS deg FROM (
         |    SELECT a AS id FROM canon UNION ALL SELECT b FROM canon)
         |  GROUP BY id),
         |o AS (
         |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
         |              THEN c.a ELSE c.b END AS src,
         |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
         |              THEN c.b ELSE c.a END AS dst
         |  FROM canon c JOIN deg da ON da.id = c.a JOIN deg db ON db.id = c.b),
         |wedge AS (
         |  SELECT l.src, l.dst AS va, r.dst AS vb
         |  FROM o l JOIN o r ON l.src = r.src AND l.dst < r.dst),
         |cl AS (SELECT least(src, dst) AS va, greatest(src, dst) AS vb FROM o),
         |tri AS (SELECT w.src, w.va, w.vb FROM wedge w JOIN cl USING (va, vb)),
         |pn AS (
         |  SELECT id, count(*)::BIGINT AS n FROM (
         |    SELECT src AS id FROM tri UNION ALL SELECT va FROM tri
         |    UNION ALL SELECT vb FROM tri)
         |  GROUP BY id)
         |SELECT d.id, coalesce(pn.n, 0)::BIGINT AS n_triangles
         |FROM deg d LEFT JOIN pn ON pn.id = d.id
         |ORDER BY d.id""".stripMargin,

    // Bradley-Terry re-derivation: integer fixed-point MM, three chained
    // iterations (the pagerank p0..p3 shape); every sum and division is
    // BIGINT-exact, dense_rank cast to INTEGER (Spark's rank type;
    // DuckDB's is BIGINT — the tdp_graph_rank physical-type lesson).
    "tdp_bt_ranking" ->
      """WITH c AS (
        |  SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source ELSE b.source END AS w,
        |         CASE WHEN a.n_chars > b.n_chars THEN b.source ELSE a.source END AS l
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.source IS NOT NULL AND b.source IS NOT NULL
        |    AND a.source <> b.source AND a.n_chars <> b.n_chars),
        |dcount AS (SELECT w, l, count(*)::BIGINT AS cnt FROM c GROUP BY w, l),
        |m AS (
        |  SELECT a, b, sum(cnt)::BIGINT AS n FROM (
        |    SELECT w AS a, l AS b, cnt FROM dcount
        |    UNION ALL SELECT l, w, cnt FROM dcount)
        |  GROUP BY a, b),
        |wi AS (SELECT w AS item, sum(cnt)::BIGINT AS wins FROM dcount GROUP BY w),
        |it AS (
        |  SELECT i.item, coalesce(wi.wins, 0)::BIGINT AS wins
        |  FROM (SELECT DISTINCT a AS item FROM m) i LEFT JOIN wi ON wi.item = i.item),
        |p0 AS (SELECT item, 1000000::BIGINT AS pi FROM it),
        |e1 AS (SELECT m.a, sum((m.n * 1000000000000) // greatest(pa.pi + pb.pi, 1))::BIGINT AS d
        |       FROM m JOIN p0 pa ON pa.item = m.a JOIN p0 pb ON pb.item = m.b GROUP BY m.a),
        |p1 AS (SELECT it.item, ((it.wins * 1000000000000) // greatest(coalesce(e1.d, 0), 1))::BIGINT AS pi
        |       FROM it LEFT JOIN e1 ON e1.a = it.item),
        |e2 AS (SELECT m.a, sum((m.n * 1000000000000) // greatest(pa.pi + pb.pi, 1))::BIGINT AS d
        |       FROM m JOIN p1 pa ON pa.item = m.a JOIN p1 pb ON pb.item = m.b GROUP BY m.a),
        |p2 AS (SELECT it.item, ((it.wins * 1000000000000) // greatest(coalesce(e2.d, 0), 1))::BIGINT AS pi
        |       FROM it LEFT JOIN e2 ON e2.a = it.item),
        |e3 AS (SELECT m.a, sum((m.n * 1000000000000) // greatest(pa.pi + pb.pi, 1))::BIGINT AS d
        |       FROM m JOIN p2 pa ON pa.item = m.a JOIN p2 pb ON pb.item = m.b GROUP BY m.a),
        |p3 AS (SELECT it.item, ((it.wins * 1000000000000) // greatest(coalesce(e3.d, 0), 1))::BIGINT AS pi
        |       FROM it LEFT JOIN e3 ON e3.a = it.item),
        |nm AS (SELECT a AS item, sum(n)::BIGINT AS n_matches FROM m GROUP BY a)
        |SELECT it.item, it.wins, nm.n_matches, p3.pi AS bt_score_fp,
        |  (dense_rank() OVER (ORDER BY p3.pi DESC, it.item ASC))::INTEGER AS rank
        |FROM it JOIN p3 ON p3.item = it.item JOIN nm ON nm.item = it.item
        |ORDER BY rank, it.item""".stripMargin,

    // Win-rate Wilson re-derivation: canonical unordered pair key, one
    // count aggregation, the dq_rate_wilson IEEE chain verbatim.
    "tdp_win_rates" ->
      """WITH c AS (
        |  SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source ELSE b.source END AS w,
        |         CASE WHEN a.n_chars > b.n_chars THEN b.source ELSE a.source END AS l
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.source IS NOT NULL AND b.source IS NOT NULL
        |    AND a.source <> b.source AND a.n_chars <> b.n_chars),
        |canon AS (
        |  SELECT least(w, l) AS item_a, greatest(w, l) AS item_b,
        |    (w = least(w, l)) AS a_won
        |  FROM c),
        |g AS (
        |  SELECT item_a, item_b, count(*)::BIGINT AS n,
        |    sum(CASE WHEN a_won THEN 1 ELSE 0 END)::BIGINT AS wins_a
        |  FROM canon GROUP BY item_a, item_b),
        |c2 AS (SELECT *, wins_a::DOUBLE / n::DOUBLE AS p, n::DOUBLE AS nd,
        |  ('1.96'::DOUBLE * '1.96'::DOUBLE) AS z2 FROM g),
        |c3 AS (SELECT *,
        |  p + z2 / ('2.0'::DOUBLE * nd) AS center,
        |  '1.96'::DOUBLE * sqrt(p * ('1.0'::DOUBLE - p) / nd
        |    + z2 / ('4.0'::DOUBLE * (nd * nd))) AS half,
        |  '1.0'::DOUBLE + z2 / nd AS denom FROM c2)
        |SELECT item_a, item_b, n, wins_a, p AS rate,
        |  greatest('0.0'::DOUBLE, (center - half) / denom) AS lo,
        |  least('1.0'::DOUBLE, (center + half) / denom) AS hi
        |FROM c3 ORDER BY item_a, item_b""".stripMargin,

    // Chosen/rejected re-derivation: the struct-extreme tie-break
    // rendered as two row_number windows — (score DESC, response DESC)
    // for chosen, (score ASC, response ASC) for rejected — equivalent to
    // the engine's lexicographic (score, response) max/min.
    "tdp_chosen_rejected" ->
      """WITH b AS (
        |  SELECT user_id AS prompt, event_id::VARCHAR AS r, value::DOUBLE AS sc
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |rk AS (
        |  SELECT prompt, r, sc,
        |    row_number() OVER (PARTITION BY prompt ORDER BY sc DESC, r DESC) AS rb,
        |    row_number() OVER (PARTITION BY prompt ORDER BY sc ASC, r ASC) AS rw
        |  FROM b),
        |best AS (SELECT prompt, r AS chosen, sc AS chosen_score FROM rk WHERE rb = 1),
        |worst AS (SELECT prompt, r AS rejected, sc AS rejected_score FROM rk WHERE rw = 1)
        |SELECT b2.prompt AS user_id, chosen, rejected, chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM best b2 JOIN worst w ON w.prompt = b2.prompt
        |WHERE NOT (chosen = rejected AND chosen_score = rejected_score)
        |ORDER BY user_id""".stripMargin,

    // Gzip JSON-lines oracle: plain parquet read — equality proves the
    // compressed text write+read preserved every value (doubles survive
    // via shortest-roundtrip JSON rendering).
    "tdp_group_advantage" ->
      """WITH b AS (
        |  SELECT user_id, event_id, CAST(floor(value * 100) AS BIGINT) AS reward_fp
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |g AS (
        |  SELECT user_id, COUNT(*) AS n, SUM(reward_fp) AS s,
        |         SUM(reward_fp * reward_fp) AS ss
        |  FROM b GROUP BY user_id),
        |st AS (
        |  SELECT user_id, n,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    sqrt(greatest(CAST(ss AS DOUBLE) / n
        |         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS std
        |  FROM g)
        |SELECT b.user_id, b.event_id, b.reward_fp, st.n, st.mean, st.std,
        |  CASE WHEN st.std > 0.0
        |       THEN (CAST(b.reward_fp AS DOUBLE) - st.mean) / st.std
        |       ELSE 0.0 END AS advantage
        |FROM b JOIN st ON st.user_id = b.user_id
        |ORDER BY b.user_id, b.event_id""".stripMargin,

    // ROUGE-2 re-derivation: same tokenizer as the LM chain, positional
    // bigram lists with a side tag, clipped-min overlap, single-division
    // ratios and a fixed-association f1.
    "txt_rouge_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |p AS (
        |  SELECT pair_id, ct, rt FROM (
        |    SELECT doc_id AS pair_id, t AS ct,
        |      lead(t) OVER (PARTITION BY source ORDER BY doc_id) AS rt
        |    FROM d)
        |  WHERE rt IS NOT NULL),
        |sides AS (
        |  SELECT pair_id, 0 AS side, array_to_string(ct[i:i+1], ' ') AS gram
        |  FROM p, LATERAL unnest(generate_series(1, len(ct) - 1)) AS g(i)
        |  WHERE len(ct) >= 2
        |  UNION ALL
        |  SELECT pair_id, 1, array_to_string(rt[i:i+1], ' ')
        |  FROM p, LATERAL unnest(generate_series(1, len(rt) - 1)) AS g(i)
        |  WHERE len(rt) >= 2),
        |pg AS (
        |  SELECT pair_id, gram,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS cc,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS rc
        |  FROM sides GROUP BY pair_id, gram),
        |ro AS (
        |  SELECT pair_id, sum(cc)::BIGINT AS n_cand, sum(rc)::BIGINT AS n_ref,
        |    sum(least(cc, rc))::BIGINT AS overlap
        |  FROM pg GROUP BY pair_id),
        |fin AS (
        |  SELECT p.pair_id AS doc_id,
        |    coalesce(ro.n_cand, 0) AS n_cand, coalesce(ro.n_ref, 0) AS n_ref,
        |    coalesce(ro.overlap, 0) AS overlap,
        |    CASE WHEN coalesce(ro.n_cand, 0) > 0
        |      THEN coalesce(ro.overlap, 0)::DOUBLE / ro.n_cand::DOUBLE END AS precision,
        |    CASE WHEN coalesce(ro.n_ref, 0) > 0
        |      THEN coalesce(ro.overlap, 0)::DOUBLE / ro.n_ref::DOUBLE END AS recall
        |  FROM p LEFT JOIN ro ON ro.pair_id = p.pair_id)
        |SELECT doc_id, n_cand, n_ref, overlap, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |         AND (precision + recall) > 0.0::DOUBLE
        |       THEN 2.0::DOUBLE * precision * recall / (precision + recall)
        |       WHEN precision IS NOT NULL AND recall IS NOT NULL
        |       THEN 0.0::DOUBLE END AS f1
        |FROM fin ORDER BY doc_id""".stripMargin,

    // RAKE re-derivation: same running-stopword-count phrase keys, exact
    // integer degree/freq, one division per word, and the identical
    // pos-ordered prepended-0.0 fold per phrase.
    "txt_rake_keywords" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, i AS pos, t[i] AS tok
        |  FROM d, LATERAL unnest(generate_series(1, len(t))) AS g(i)),
        |s AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN tok IN ('the', 'a', 'and', 'of', 'to') THEN 1 ELSE 0 END AS st
        |  FROM toks),
        |r AS (
        |  SELECT doc_id, pos, tok, st,
        |    sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS pk
        |  FROM s),
        |w AS (SELECT doc_id, pk, pos, tok FROM r WHERE st = 0),
        |plen AS (
        |  SELECT doc_id, pk, count(*)::BIGINT AS wlen
        |  FROM w GROUP BY doc_id, pk),
        |occ AS (
        |  SELECT w.doc_id, w.pk, w.pos, w.tok, plen.wlen
        |  FROM w JOIN plen USING (doc_id, pk)),
        |ws AS (
        |  SELECT tok,
        |    sum(wlen)::DOUBLE / count(*)::DOUBLE AS wsc
        |  FROM occ GROUP BY tok),
        |ph AS (
        |  SELECT occ.doc_id, occ.pk,
        |    string_agg(occ.tok, ' ' ORDER BY occ.pos) AS phrase,
        |    count(*)::BIGINT AS n_words,
        |    list_reduce(list_prepend(0.0::DOUBLE, array_agg(ws.wsc ORDER BY occ.pos)),
        |      (a, b) -> a + b) AS score
        |  FROM occ JOIN ws USING (tok)
        |  GROUP BY occ.doc_id, occ.pk)
        |SELECT phrase, max(n_words)::BIGINT AS n_words,
        |  count(*)::BIGINT AS n_occurrences, max(score) AS score
        |FROM ph GROUP BY phrase
        |ORDER BY score DESC, phrase LIMIT 30""".stripMargin,

    // BLEU-2 re-derivation: the rouge pairing and tokenizer, (n, side)-
    // tagged gram streams, clipped-min overlaps per size, exact-rational
    // precisions, and the 6-dp-rounded geo-mean x brevity-exp.
    "txt_bleu_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |p AS (
        |  SELECT pair_id, ct, rt FROM (
        |    SELECT doc_id AS pair_id, t AS ct,
        |      lead(t) OVER (PARTITION BY source ORDER BY doc_id) AS rt
        |    FROM d)
        |  WHERE rt IS NOT NULL),
        |lens AS (SELECT pair_id, len(ct)::BIGINT AS c_len, len(rt)::BIGINT AS r_len FROM p),
        |sides AS (
        |  SELECT pair_id, 1 AS n, 0 AS side, ct[i] AS gram
        |  FROM p, LATERAL unnest(generate_series(1, len(ct))) AS g(i)
        |  UNION ALL
        |  SELECT pair_id, 2, 0, array_to_string(ct[i:i+1], ' ')
        |  FROM p, LATERAL unnest(generate_series(1, len(ct) - 1)) AS g(i)
        |  WHERE len(ct) >= 2
        |  UNION ALL
        |  SELECT pair_id, 1, 1, rt[i]
        |  FROM p, LATERAL unnest(generate_series(1, len(rt))) AS g(i)
        |  UNION ALL
        |  SELECT pair_id, 2, 1, array_to_string(rt[i:i+1], ' ')
        |  FROM p, LATERAL unnest(generate_series(1, len(rt) - 1)) AS g(i)
        |  WHERE len(rt) >= 2),
        |pg AS (
        |  SELECT pair_id, n, gram,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS cc,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS rc
        |  FROM sides GROUP BY pair_id, n, gram),
        |ro AS (
        |  SELECT pair_id,
        |    sum(CASE WHEN n = 1 THEN least(cc, rc) ELSE 0 END)::BIGINT AS n1_clip,
        |    sum(CASE WHEN n = 2 THEN cc ELSE 0 END)::BIGINT AS n2_cand,
        |    sum(CASE WHEN n = 2 THEN least(cc, rc) ELSE 0 END)::BIGINT AS n2_clip
        |  FROM pg GROUP BY pair_id),
        |fin AS (
        |  SELECT l.pair_id AS doc_id, l.c_len, l.r_len,
        |    coalesce(ro.n1_clip, 0) AS n1_clip,
        |    coalesce(ro.n2_cand, 0) AS n2_cand,
        |    coalesce(ro.n2_clip, 0) AS n2_clip,
        |    CASE WHEN l.c_len > 0
        |      THEN coalesce(ro.n1_clip, 0)::DOUBLE / l.c_len::DOUBLE END AS p1,
        |    CASE WHEN coalesce(ro.n2_cand, 0) > 0
        |      THEN coalesce(ro.n2_clip, 0)::DOUBLE / ro.n2_cand::DOUBLE END AS p2
        |  FROM lens l LEFT JOIN ro ON ro.pair_id = l.pair_id)
        |SELECT doc_id, c_len, r_len, n1_clip, n2_cand, n2_clip, p1, p2,
        |  CASE WHEN p1 IS NOT NULL AND p2 IS NOT NULL
        |       THEN round(sqrt(p1 * p2)
        |         * exp(least(0.0::DOUBLE, 1.0::DOUBLE - r_len::DOUBLE / c_len::DOUBLE)), 6)
        |  END AS bleu2
        |FROM fin ORDER BY doc_id""".stripMargin,

    // Overlap-matrix re-derivation: the tdp_graph_rank shingle CTE keyed
    // by source, distinct sets, shingle-keyed pair join, one division.
    "tdp_cms_freq" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |consts AS (SELECT * FROM (VALUES
        |  (0, 1::BIGINT, 0::BIGINT), (1, 1777::BIGINT, 97::BIGINT),
        |  (2, 7919::BIGINT, 1009::BIGINT), (3, 104729::BIGINT, 30011::BIGINT))
        |  AS t(r, a, b)),
        |h AS (SELECT source, term, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM toks),
        |bkt AS (
        |  SELECT source, c.r AS r,
        |    ((c.a * (h.h % 2147483647) + c.b) % 2147483647) % 16 AS bk,
        |    count(*)::BIGINT AS cnt
        |  FROM h CROSS JOIN consts c
        |  GROUP BY source, c.r, bk),
        |tot AS (SELECT source, count(*)::BIGINT AS total FROM toks GROUP BY source),
        |exact AS (SELECT source, term, count(*)::BIGINT AS exact
        |          FROM toks GROUP BY source, term),
        |probe AS (
        |  SELECT e.source, e.term, e.exact, c.r,
        |    ((c.a * ((('0x' || substr(md5(e.term), 1, 8))::BIGINT) % 2147483647) + c.b)
        |      % 2147483647) % 16 AS bk
        |  FROM exact e CROSS JOIN consts c),
        |est AS (
        |  SELECT p.source, p.term, p.exact, min(b.cnt) AS est
        |  FROM probe p
        |  JOIN bkt b ON b.source = p.source AND b.r = p.r AND b.bk = p.bk
        |  GROUP BY p.source, p.term, p.exact)
        |SELECT e.source, e.term, e.exact, e.est, t.total
        |FROM est e JOIN tot t USING (source)
        |ORDER BY source, term""".stripMargin,

    // One-pass conditional counts, NULL predicate counts as violation.
    "tdp_expectations" ->
      """WITH a AS (SELECT count(*)::BIGINT AS n,
        |  sum(CASE WHEN NOT coalesce(event_id IS NOT NULL, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v1,
        |  sum(CASE WHEN NOT coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) THEN 1 ELSE 0 END)::BIGINT AS v2,
        |  sum(CASE WHEN NOT coalesce(year(ts) = 2024, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v3,
        |  sum(CASE WHEN NOT coalesce(user_id > 0, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v4,
        |  sum(CASE WHEN NOT coalesce(value < 100.0, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v5
        |  FROM events)
        |SELECT rule, n AS n_rows, v AS n_violations, v = 0 AS pass FROM (
        |  SELECT 'event_id_not_null' AS rule, n, v1 AS v FROM a
        |  UNION ALL SELECT 'event_type_known', n, v2 FROM a
        |  UNION ALL SELECT 'ts_in_2024', n, v3 FROM a
        |  UNION ALL SELECT 'user_id_positive', n, v4 FROM a
        |  UNION ALL SELECT 'value_small', n, v5 FROM a)
        |ORDER BY rule""".stripMargin,

    // PSI re-derivation: same clamped equal-width binning, Laplace
    // shares as exact rationals, contribution = round((p-q)*ln(p/q), 9)
    // decimal-summed.
    "tdp_psi_drift" -> PinnedOracles.sql("tdp_psi_drift"),

    // KS re-derivation: the psi binning CTEs, running-sum CDFs (exact
    // integers), single divisions, abs-difference, max — no rounding
    // discipline anywhere.
    "tdp_pps_sample" ->
      """WITH tot AS (
        |  SELECT sum(CASE WHEN length(text) > 0 THEN length(text)::BIGINT ELSE 0 END)::BIGINT
        |    AS total
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(text) IS NULL OR length(text) <= 0 OR coalesce(total, 0) <= 0
        |         THEN '0.0'::DOUBLE
        |         ELSE least('1.0'::DOUBLE,
        |           '100.0'::DOUBLE * length(text)::DOUBLE / total::DOUBLE) END AS pi
        |  FROM documents CROSS JOIN tot)
        |SELECT doc_id, source, '1.0'::DOUBLE / pi AS ht_weight
        |FROM p
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0 < pi
        |ORDER BY doc_id""".stripMargin,

    // Component-split re-derivation: the shared LSH pair chain,
    // recursive transitive closure, min-id component labels, singleton
    // fallback to own id, then the tdp_hash_split draw keyed by the
    // component.
    "tdp_component_split" ->
      (lshPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n" +
        """edges AS (
          |  SELECT id_a AS s, id_b AS d FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(id, r) AS (
          |  SELECT DISTINCT s AS id, s AS r FROM edges
          |  UNION
          |  SELECT e2.s AS id, rr.r FROM edges e2 JOIN reach rr ON e2.d = rr.id),
          |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
          |wc AS (
          |  SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS component
          |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
          |SELECT id, component,
          |  CASE WHEN h < 0.8 THEN 'train' WHEN h < 0.9 THEN 'val' ELSE 'test' END
          |    AS split
          |FROM (SELECT id, component,
          |  ('0x' || substr(md5(component::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS h
          |  FROM wc)
          |ORDER BY id""".stripMargin),

    // Augmentation re-derivation: identical per-token hash draw
    // (DuckDB list_filter index is 1-based -> i-1 aligns with the
    // engine's 0-based position).
    "tdp_augment_dropout" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents)
        |SELECT id,
        |  array_to_string(list_filter(t, (x, i) ->
        |    ('0x' || substr(md5(id::VARCHAR || ':' || (i-1)::VARCHAR || ':aug'), 1, 8))::BIGINT
        |      % 1000 >= 100), ' ') AS aug_text,
        |  len(t)::BIGINT AS n_tokens,
        |  (len(t) - len(list_filter(t, (x, i) ->
        |    ('0x' || substr(md5(id::VARCHAR || ':' || (i-1)::VARCHAR || ':aug'), 1, 8))::BIGINT
        |      % 1000 >= 100)))::BIGINT AS n_dropped
        |FROM tk ORDER BY id""".stripMargin,

    // Span-corruption re-derivation: same block tiling, portable-hash
    // mask/length draws, sentinel numbering via list_position over the
    // masked-block list, and the same slice arithmetic.
    "tdp_augment_spans" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |b AS (
        |  SELECT id, t, len(t)::BIGINT AS n,
        |    CASE WHEN len(t) > 0
        |      THEN range(0, ((len(t)::BIGINT - 1) // 8) + 1)
        |      ELSE []::BIGINT[] END AS blocks
        |  FROM tk),
        |m AS (
        |  SELECT id, t, n, blocks,
        |    list_filter(blocks, bb ->
        |      ('0x' || substr(md5(id::VARCHAR || ':' || bb::VARCHAR || ':m:t5'), 1, 8))::BIGINT
        |        % 1000 < 200) AS masked
        |  FROM b)
        |SELECT id,
        |  coalesce(array_to_string(flatten(list_transform(blocks, bb ->
        |    CASE WHEN coalesce(list_position(masked, bb), 0) > 0
        |      THEN list_prepend(
        |        '<extra_id_' || (list_position(masked, bb) - 1)::VARCHAR || '>',
        |        t[(bb*8 + 1 + 1 + ('0x' || substr(md5(id::VARCHAR || ':' || bb::VARCHAR || ':l:t5'), 1, 8))::BIGINT % 1000 % 3)::INT
        |          : least((bb+1)*8, n)::INT])
        |      ELSE t[(bb*8 + 1)::INT : least((bb+1)*8, n)::INT] END)), ' '), '') AS corrupted,
        |  coalesce(array_to_string(flatten(list_transform(masked, bb ->
        |    list_prepend(
        |      '<extra_id_' || (list_position(masked, bb) - 1)::VARCHAR || '>',
        |      t[(bb*8 + 1)::INT
        |        : least(bb*8 + 1 + ('0x' || substr(md5(id::VARCHAR || ':' || bb::VARCHAR || ':l:t5'), 1, 8))::BIGINT % 1000 % 3, n)::INT]))), ' '), '') AS targets,
        |  n AS n_tokens,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(masked, bb ->
        |    least(1 + ('0x' || substr(md5(id::VARCHAR || ':' || bb::VARCHAR || ':l:t5'), 1, 8))::BIGINT % 1000 % 3,
        |      least(8, n - bb*8)))), (a, x) -> a + x) AS n_masked
        |FROM m ORDER BY id""".stripMargin,

    // Distribution-match re-derivation: exact-integer bucket quotas
    // (HUGEINT product, floor division), portable-hash per-bucket rank.
    "tdp_distribution_match" ->
      """WITH tgt AS (
        |  SELECT n_chars // 100 AS bucket FROM documents WHERE doc_id % 5 = 0),
        |th AS (SELECT bucket, count(*)::BIGINT AS tc FROM tgt GROUP BY bucket),
        |tn AS (SELECT sum(tc)::BIGINT AS tn FROM th),
        |q AS (
        |  SELECT bucket,
        |    (CASE WHEN tn > 0 THEN (150 * tc) // tn ELSE 0 END)::BIGINT AS quota
        |  FROM th CROSS JOIN tn),
        |src AS (
        |  SELECT doc_id AS id, n_chars // 100 AS bucket,
        |    row_number() OVER (PARTITION BY n_chars // 100
        |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT ASC,
        |        doc_id ASC) AS rn
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT s.id, s.bucket FROM src s JOIN q ON q.bucket = s.bucket
        |WHERE s.rn <= q.quota
        |ORDER BY s.bucket, s.id""".stripMargin,

    // Classifier-pairs re-derivation: the txt_source_percentile
    // cume_dist, decile cuts, per-group extreme ranks, (group, rank)
    // equi-join.
    "tdp_classifier_pairs" ->
      """WITH p AS (
        |  SELECT source AS grp, doc_id AS id, n_chars AS score,
        |    (count(*) OVER (PARTITION BY source ORDER BY n_chars
        |                    RANGE UNBOUNDED PRECEDING) * 1000000000)
        |      // count(*) OVER (PARTITION BY source) AS pct_n9
        |  FROM documents),
        |tp AS (
        |  SELECT grp, id, score,
        |    row_number() OVER (PARTITION BY grp ORDER BY pct_n9 DESC, id ASC) AS rk
        |  FROM p WHERE pct_n9 >= 900000000),
        |bt AS (
        |  SELECT grp, id, score,
        |    row_number() OVER (PARTITION BY grp ORDER BY pct_n9 ASC, id ASC) AS rk
        |  FROM p WHERE pct_n9 <= 100000000)
        |SELECT tp.grp AS "group", tp.rk::BIGINT AS pair_rank,
        |  tp.id AS chosen_id, tp.score AS chosen_score,
        |  bt.id AS rejected_id, bt.score AS rejected_score
        |FROM tp JOIN bt ON bt.grp = tp.grp AND bt.rk = tp.rk
        |ORDER BY "group", pair_rank""".stripMargin,

    // Capped-mixture re-derivation: identical waterline chain — integer
    // prefix sums (exact on both engines), λ/ratios as single divisions
    // of exact integers, prefix-closed saturation via a running min.
    "tdp_capped_mixture" ->
      """WITH tk AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n
        |  FROM documents WHERE source IS NOT NULL),
        |caps AS (
        |  SELECT source, sum(CASE WHEN n > 0 THEN n ELSE 0 END)::BIGINT AS capacity
        |  FROM tk GROUP BY source),
        |w AS (
        |  SELECT source, capacity,
        |    CAST(floor(sqrt(capacity::DOUBLE) * 1000000.0) AS BIGINT) AS weight
        |  FROM caps),
        |pre AS (SELECT *, capacity::DOUBLE / weight::DOUBLE AS rr FROM w),
        |pre2 AS (
        |  SELECT *,
        |    sum(capacity) OVER wr AS ck,
        |    sum(weight) OVER wr AS wk,
        |    sum(weight) OVER () AS wtot,
        |    row_number() OVER (ORDER BY rr, source) AS rn
        |  FROM pre WINDOW wr AS (ORDER BY rr, source ROWS UNBOUNDED PRECEDING)),
        |lamt AS (
        |  SELECT *,
        |    (25000 - ck)::DOUBLE / (wtot - wk)::DOUBLE AS lamk,
        |    25000::DOUBLE / wtot::DOUBLE AS lam0
        |  FROM pre2),
        |sat AS (
        |  SELECT *, CASE WHEN rr <= coalesce(lag(lamk) OVER (ORDER BY rr, source), lam0)
        |    THEN 1 ELSE 0 END AS sh FROM lamt),
        |sat2 AS (
        |  SELECT *,
        |    (min(sh) OVER (ORDER BY rr, source ROWS UNBOUNDED PRECEDING) = 1) AS saturated
        |  FROM sat),
        |fin AS (SELECT max_by(lamk, rn) AS lamf, count(*) AS nsat FROM sat2 WHERE saturated)
        |SELECT source, capacity, weight,
        |  (CASE WHEN saturated THEN capacity
        |        ELSE least(capacity, CAST(floor(weight::DOUBLE *
        |          (CASE WHEN nsat = 0 THEN lam0 ELSE lamf END)) AS BIGINT)) END)::BIGINT
        |    AS allocation,
        |  saturated
        |FROM sat2 CROSS JOIN fin
        |ORDER BY source""".stripMargin,

    // Exact-sample re-derivation: the FLAT global order-by-md5 LIMIT —
    // independent of the engine's bucket-histogram threshold selection.
    "tdp_exact_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id::VARCHAR) AS rn
        |  FROM documents)
        |WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

    // Priority-sample re-derivation: the same priority draw (w over the
    // (h+1)/2^32 md5-uniform — both exactly-rounded IEEE ops in the
    // engine's association order), then ONE flat global rank window and
    // the 101st-priority threshold — independent of the engine's
    // per-partition TakeOrdered heaps.
    "tdp_weighted_sample" ->
      """WITH p AS (
        |  SELECT doc_id, source, n_chars,
        |    n_chars::DOUBLE /
        |      ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE + 1.0)
        |        / 4294967296.0) AS q
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars::DOUBLE > 0.0),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY q DESC, doc_id::VARCHAR ASC) AS rn
        |  FROM p),
        |tau AS (
        |  SELECT coalesce(max(CASE WHEN rn = 101 THEN q END), 0.0) AS tau FROM r)
        |SELECT doc_id, source, n_chars, q AS priority,
        |  greatest(n_chars::DOUBLE, tau) AS est_weight
        |FROM r CROSS JOIN tau WHERE rn <= 100
        |ORDER BY doc_id""".stripMargin,

    // Per-group re-derivation: identical draw, rank and the 11th
    // priority both per source, the same greatest().
    "tdp_weighted_sample_grp" ->
      """WITH p AS (
        |  SELECT doc_id, source, n_chars,
        |    n_chars::DOUBLE /
        |      ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE + 1.0)
        |        / 4294967296.0) AS q
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars::DOUBLE > 0.0),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY source ORDER BY q DESC, doc_id::VARCHAR ASC) AS rn
        |  FROM p),
        |tau AS (
        |  SELECT source,
        |    coalesce(max(CASE WHEN rn = 11 THEN q END), 0.0) AS tau
        |  FROM r GROUP BY source)
        |SELECT r.doc_id, r.source, r.n_chars, r.q AS priority,
        |  greatest(r.n_chars::DOUBLE, tau.tau) AS est_weight
        |FROM r JOIN tau ON tau.source IS NOT DISTINCT FROM r.source
        |WHERE r.rn <= 10
        |ORDER BY r.doc_id""".stripMargin,

    // Time-embargo re-derivation: the cutoff as a flat global order
    // statistic (rank = (n-1)*80//100 + 1 over the sorted multiset —
    // tie order is irrelevant to the value at a rank), then the same
    // three-way CASE.
    "tdp_time_embargo" ->
      """WITH m AS (
        |  SELECT event_id AS id, epoch_us(ts) AS tsm
        |  FROM events WHERE ts IS NOT NULL),
        |n AS (SELECT count(*)::BIGINT AS n FROM m),
        |cut AS (
        |  SELECT r.tsm AS cutoff FROM (
        |    SELECT tsm, row_number() OVER (ORDER BY tsm) AS rn FROM m) r, n
        |  WHERE r.rn = ((n.n - 1) * 80) // 100 + 1)
        |SELECT m.id, m.tsm AS ts_micros,
        |  CASE WHEN m.tsm > c.cutoff THEN 'test'
        |       WHEN m.tsm <= c.cutoff - 7200000000 THEN 'train'
        |       ELSE 'embargo' END AS split
        |FROM m, cut c ORDER BY id""".stripMargin,

    // k-fold re-derivation: ONE flat per-source row_number in (md5
    // priority, id) order, mod k — independent of the engine's two-level
    // bucketed rank decomposition.
    "tdp_kfold" ->
      """SELECT doc_id AS id, source,
        |  ((row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) - 1) % 5)::BIGINT AS fold
        |FROM documents
        |WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |ORDER BY id""".stripMargin,

    // Source-quota re-derivation: ONE flat per-source cumulative window
    // in (md5 priority, id) order — independent of the engine's
    // two-level bucketed prefix sum.
    "tdp_source_quota" ->
      """WITH d AS (
        |  SELECT doc_id AS id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
        |      AS n_tokens,
        |    md5(doc_id::VARCHAR) AS pri
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (
        |  SELECT id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, id
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM d)
        |SELECT id, source, n_tokens, cum_tokens,
        |  cum_tokens <= 800 AS admitted
        |FROM c ORDER BY source, cum_tokens, id""".stripMargin,

    // Curriculum stages: interpolated quantile thresholds (both engines
    // compute lower + (upper-lower)*frac), first-boundary-wins CASE with
    // ties to the lower stage.
    "tdp_curriculum" ->
      """WITH thr AS (
        |  SELECT quantile_cont(length(text)::DOUBLE, 0.25) AS t0,
        |    quantile_cont(length(text)::DOUBLE, 0.5) AS t1,
        |    quantile_cont(length(text)::DOUBLE, 0.75) AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  (CASE WHEN length(text) IS NULL THEN NULL
        |        WHEN length(text)::DOUBLE <= t0 THEN 0
        |        WHEN length(text)::DOUBLE <= t1 THEN 1
        |        WHEN length(text)::DOUBLE <= t2 THEN 2
        |        ELSE 3 END)::INT AS stage
        |FROM documents CROSS JOIN thr ORDER BY doc_id""".stripMargin,

    // OHLC: same exact floor-division bucketing (epoch micros // width);
    // open/close re-derived via (ts, event_id)-ordered row_number — the
    // window is the oracle's rendering of the engine's min_by/max_by
    // champion (event_id is unique, so both are deterministic).
    "txt_vocab_drift" -> PinnedOracles.sql("txt_vocab_drift"),

    // PMI: same tokenizer as the LM oracles, bigrams from the token list
    // itself, single-ln ratio in the engine's association rounded to
    // 6 dp, (pmi desc, w1, w2) cut.
    "txt_pmi_bigrams" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |uni AS (
        |  SELECT term, count(*)::BIGINT AS c
        |  FROM (SELECT unnest(t) AS term FROM d) GROUP BY term),
        |st AS (SELECT sum(c)::BIGINT AS n_tok FROM uni),
        |bi AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c_bi FROM (
        |    SELECT t[i-1] AS w1, t[i] AS w2
        |    FROM d, LATERAL unnest(generate_series(2, len(t))) AS g(i))
        |  GROUP BY w1, w2),
        |bst AS (SELECT sum(c_bi)::BIGINT AS m_bi FROM bi)
        |SELECT b.w1, b.w2, b.c_bi, u1.c AS c1, u2.c AS c2,
        |  round(ln((b.c_bi::DOUBLE / m_bi::DOUBLE) /
        |    ((u1.c::DOUBLE / n_tok::DOUBLE) * (u2.c::DOUBLE / n_tok::DOUBLE))), 6) AS pmi
        |FROM bi b JOIN uni u1 ON u1.term = b.w1 JOIN uni u2 ON u2.term = b.w2
        |CROSS JOIN st CROSS JOIN bst
        |WHERE b.c_bi >= 5
        |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 25""".stripMargin,

    // Funnel: per-step min-ts CTEs, each gated on the previous step's
    // completion time (>=), left-joined for the stage count.
    "txt_rrf_fusion" ->
      s"""WITH d AS (
         |  SELECT doc_id AS id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |st AS (SELECT count(t)::BIGINT AS n_docs, avg(len(t)) AS avgdl FROM d),
         |post AS (SELECT id, len(t) AS dl, unnest(t) AS term FROM d),
         |qp AS (
         |  SELECT id, term, count(*)::BIGINT AS tf, min(dl) AS dl FROM post
         |  WHERE term IN ('spark', 'query', 'fast') GROUP BY id, term),
         |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY term),
         |bsc AS (
         |  SELECT id,
         |    round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))), 6) AS score
         |  FROM qp JOIN dfreq USING (term) CROSS JOIN st GROUP BY id),
         |ra AS (
         |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r
         |  FROM (SELECT id, score FROM bsc ORDER BY score DESC, id LIMIT 10)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
         |c AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings WHERE vec_id <> 3),
         |p AS (
         |  SELECT nid, $dotSql AS dot, ${normSql("qv")} AS nq, ${normSql("cv")} AS nc
         |  FROM q, c),
         |csc AS (
         |  SELECT nid, CASE WHEN nq * nc > 0 THEN dot / (nq * nc) ELSE 0.0 END AS cosine
         |  FROM p),
         |rb AS (
         |  SELECT nid AS id, row_number() OVER (ORDER BY cosine DESC, nid) AS r
         |  FROM csc QUALIFY r <= 10),
         |f AS (
         |  SELECT coalesce(ra.id, rb.id) AS id, ra.r AS rank_a, rb.r AS rank_b
         |  FROM ra FULL OUTER JOIN rb ON ra.id = rb.id)
         |SELECT id,
         |  coalesce('1.0'::DOUBLE / (60 + rank_a), '0.0'::DOUBLE)
         |    + coalesce('1.0'::DOUBLE / (60 + rank_b), '0.0'::DOUBLE) AS rrf,
         |  rank_a, rank_b
         |FROM f ORDER BY rrf DESC, id LIMIT 10""".stripMargin,

    // Hard negatives: the bruteforce CTE chain plus the strict label
    // mismatch (both known AND unequal) before ranking.
    "tdp_negative_sample" ->
      """WITH idx AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS i FROM documents),
        |nn AS (SELECT count(*)::BIGINT AS n FROM idx),
        |pairs AS (
        |  SELECT idx.doc_id AS anchor, g.j AS neg_rank,
        |    (i + 1 + (('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR || ':neg'), 1, 8))
        |      ::BIGINT % (n - 1))) % n AS ni
        |  FROM idx CROSS JOIN nn, LATERAL unnest(generate_series(1, 3)) AS g(j)
        |  WHERE n > 1)
        |SELECT p.anchor, p.neg_rank, i2.doc_id AS negative
        |FROM pairs p JOIN idx i2 ON i2.i = p.ni
        |ORDER BY anchor, neg_rank""".stripMargin,

    // Profile: per-column aggregates unpivoted as UNION ALL; dtypes are
    // the engine's simpleString names. documents carries no doubles, so
    // every min/max renders identically as VARCHAR on both engines.
    "tdp_pass_at_k" ->
      """WITH b AS (
        |  SELECT user_id, count(*)::BIGINT AS n,
        |    sum(CASE WHEN value > 500.0::DOUBLE THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY user_id)
        |SELECT user_id, n, c,
        |  CASE WHEN n < 1 THEN NULL WHEN n - c < 1 THEN 1.0::DOUBLE
        |    ELSE 1.0::DOUBLE - list_reduce(list_prepend(1.0::DOUBLE,
        |      list_transform(range(1), i ->
        |        (n::DOUBLE - c::DOUBLE - i::DOUBLE) / (n::DOUBLE - i::DOUBLE))),
        |      (a, x) -> a * x) END AS pass_at_1,
        |  CASE WHEN n < 5 THEN NULL WHEN n - c < 5 THEN 1.0::DOUBLE
        |    ELSE 1.0::DOUBLE - list_reduce(list_prepend(1.0::DOUBLE,
        |      list_transform(range(5), i ->
        |        (n::DOUBLE - c::DOUBLE - i::DOUBLE) / (n::DOUBLE - i::DOUBLE))),
        |      (a, x) -> a * x) END AS pass_at_5,
        |  CASE WHEN n < 10 THEN NULL WHEN n - c < 10 THEN 1.0::DOUBLE
        |    ELSE 1.0::DOUBLE - list_reduce(list_prepend(1.0::DOUBLE,
        |      list_transform(range(10), i ->
        |        (n::DOUBLE - c::DOUBLE - i::DOUBLE) / (n::DOUBLE - i::DOUBLE))),
        |      (a, x) -> a * x) END AS pass_at_10
        |FROM b ORDER BY user_id""".stripMargin,

    // k-anonymity re-derivation: the equivalence-class multiplicity
    // table (NULL-safe grouping), exact rollups.
    "txt_oov_rate" ->
      """WITH v AS (
        |  SELECT token AS term FROM (
        |    SELECT token, count(*) AS n FROM (
        |      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |        AS token
        |      FROM documents)
        |    GROUP BY token ORDER BY n DESC, token LIMIT 20)),
        |d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |x AS (SELECT doc_id, unnest(t) AS term FROM d),
        |a AS (
        |  SELECT x.doc_id, count(*)::BIGINT AS n_tokens,
        |    sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |  FROM x LEFT JOIN v ON v.term = x.term GROUP BY x.doc_id)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
        |  coalesce(a.n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(a.n_tokens, 0) > 0
        |       THEN a.n_oov::DOUBLE / a.n_tokens::DOUBLE END AS oov_rate
        |FROM d LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Two unrolled GD iterations: per-row gradient contributions quantized
    // via floor(x*1e9 + 0.5) (bit-stable IEEE) and summed as BIGINT, the
    // weight updates as single double ops in the engine's association
    // order, then sigma(w.x) re-scored over ALL docs (nulls propagate).
    "txt_lr_train" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    1.0::DOUBLE AS x0,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::DOUBLE AS x1,
        |    n_chars::DOUBLE / 100 AS x2,
        |    (lang = 'en')::INT::DOUBLE AS y
        |  FROM documents
        |  WHERE text IS NOT NULL AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |s1 AS (SELECT
        |    sum((floor((y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(0.0::DOUBLE*x0 + 0.0::DOUBLE*x1 + 0.0::DOUBLE*x2))))
        |      * x0 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s0,
        |    sum((floor((y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(0.0::DOUBLE*x0 + 0.0::DOUBLE*x1 + 0.0::DOUBLE*x2))))
        |      * x1 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s1,
        |    sum((floor((y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(0.0::DOUBLE*x0 + 0.0::DOUBLE*x1 + 0.0::DOUBLE*x2))))
        |      * x2 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s2,
        |    count(*)::BIGINT AS n
        |  FROM f),
        |w1 AS (SELECT
        |    0.0::DOUBLE + 0.5::DOUBLE * ((s0::DOUBLE / 1e9) / n) AS w0,
        |    0.0::DOUBLE + 0.5::DOUBLE * ((s1::DOUBLE / 1e9) / n) AS w1,
        |    0.0::DOUBLE + 0.5::DOUBLE * ((s2::DOUBLE / 1e9) / n) AS w2
        |  FROM s1),
        |s2 AS (SELECT
        |    sum((floor((f.y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))))
        |      * f.x0 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s0,
        |    sum((floor((f.y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))))
        |      * f.x1 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s1,
        |    sum((floor((f.y - 1.0::DOUBLE/(1.0::DOUBLE + exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))))
        |      * f.x2 * 1e9 + 0.5::DOUBLE))::BIGINT) AS s2,
        |    count(*)::BIGINT AS n
        |  FROM f CROSS JOIN w1 w),
        |w2 AS (SELECT
        |    w.w0 + 0.5::DOUBLE * ((s.s0::DOUBLE / 1e9) / s.n) AS w0,
        |    w.w1 + 0.5::DOUBLE * ((s.s1::DOUBLE / 1e9) / s.n) AS w1,
        |    w.w2 + 0.5::DOUBLE * ((s.s2::DOUBLE / 1e9) / s.n) AS w2
        |  FROM w1 w CROSS JOIN s2 s),
        |fall AS (
        |  SELECT doc_id,
        |    1.0::DOUBLE AS x0,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::DOUBLE AS x1,
        |    n_chars::DOUBLE / 100 AS x2,
        |    (lang = 'en')::INT AS y
        |  FROM documents)
        |SELECT f.doc_id, f.y::BIGINT AS y,
        |  (floor(1.0::DOUBLE/(1.0::DOUBLE + exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2)))
        |    * 1e9 + 0.5::DOUBLE))::BIGINT AS score_n
        |FROM fall f CROSS JOIN w2 w
        |ORDER BY doc_id""".stripMargin,

    "txt_lm_train" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents)
        |SELECT w1, w2, count(*)::BIGINT AS c FROM (
        |  SELECT t[i-1] AS w1, t[i] AS w2
        |  FROM d, LATERAL unnest(generate_series(2, len(t))) AS g(i))
        |GROUP BY w1, w2 ORDER BY c DESC, w1, w2 LIMIT 400""".stripMargin,

    // Full re-derivation of the stupid-backoff bigram LM score: capped
    // count tables, smoothed unigram fallback, per-token neg-log-probs
    // rounded to 6 dp and decimal-summed. All double arithmetic mirrors
    // the engine's association order term for term (single divisions,
    // literal-first products, ::DOUBLE literals to defeat DuckDB's
    // DECIMAL literal typing).
    "txt_lm_score" ->
      lmScoreSql("(SELECT doc_id AS id, text FROM documents)", 20, 400),

    // SF-independent LM twin on an inline corpus that hits every path:
    // vocab cap 3 of 4 (d is OOV), an unseen bigram (backoff), an empty
    // doc (n_tokens 0, NULL score).
    "txt_lm_score_fx" -> PinnedOracles.sql("txt_lm_score_fx"),

    // Native spectra clustering re-derivation: identical synthesis
    // (integer intensities => exact dots/norms), binning + top-20 bins with
    // the kernel's (w DESC, bin ASC) tie-break, shared-top-6-bin candidate
    // join with the exact |Δpmz| gate, cosine >= 0.95 edges, and
    // connected components as a recursive min-label closure over the
    // symmetric edge set (components are tiny planted chains, so the
    // closure is bounded; the engine side runs large-star/small-star).
    "tdp_fuzzy_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
         |      ELSE [array_to_string(t, ' ')] END)) AS shingle
         |  FROM toks),
         |hs AS (
         |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
         |  FROM hs CROSS JOIN (SELECT * FROM (VALUES $minhashCoeffs) AS t(i, a, b)) co
         |  GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
         |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id, r.doc_id AS bench_id
         |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh
         |  WHERE l.doc_id % 20 <> 0 AND r.doc_id % 20 = 0),
         |est AS (
         |  SELECT id, bench_id,
         |    sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 16.0 AS ej
         |  FROM cand
         |  JOIN mh ma ON ma.doc_id = id
         |  JOIN mh mb ON mb.doc_id = bench_id AND mb.i = ma.i
         |  GROUP BY id, bench_id),
         |mx AS (SELECT id, max(ej) AS mj FROM est GROUP BY id)
         |SELECT d.doc_id AS id, coalesce(mx.mj, 0.0) AS max_bench_jaccard,
         |  coalesce(mx.mj, 0.0) >= 0.5 AS contaminated
         |FROM documents d LEFT JOIN mx ON mx.id = d.doc_id
         |WHERE d.doc_id % 20 <> 0
         |ORDER BY id""".stripMargin,

    "txt_quality" ->
      """WITH tk AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text, toks, len(toks) AS n_tokens,
        |    list_reduce(list_prepend(0, list_transform(toks, t -> len(t))), (a,b) -> a+b)::DOUBLE
        |      / len(toks) AS mean_token_len,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that')))::DOUBLE
        |      / len(toks) AS stopword_ratio,
        |    (len(text) - len(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE
        |      / len(text) AS punct_ratio
        |  FROM tk)
        |SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, punct_ratio,
        |  (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * 0.4::DOUBLE
        |    + (CASE WHEN stopword_ratio > 0.02 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN punct_ratio < 0.2 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,

    // Gopher-rules re-derivation: identical tokenization (single-space
    // words, chr(10) lines), identical replace-scan symbol counts, every
    // flag the same cross-multiplied integer comparison.
    "txt_gopher_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, text AS t,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    list_reduce(list_prepend(0, list_transform(toks, x -> len(x))),
        |                (a, b) -> a + b)::BIGINT AS sum_word_len,
        |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
        |    ((len(t) - len(replace(t, '#', '')))
        |      + (len(t) - len(replace(t, '...', ''))) // 3)::BIGINT AS n_sym,
        |    len(lines)::BIGINT AS n_lines,
        |    len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]')))::BIGINT AS n_bullet_lines,
        |    len(list_filter(lines, x -> x LIKE '%...'))::BIGINT AS n_ellipsis_lines,
        |    len(list_filter(list_distinct(toks),
        |        x -> x IN ('the','a','of','and','to','in','is','that')))::BIGINT AS n_stop_distinct
        |  FROM tk),
        |f AS (
        |  SELECT *,
        |    (n_words >= 5 AND n_words <= 100000) AS ok_words,
        |    (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words) AS ok_mean_len,
        |    (10 * n_sym < n_words) AS ok_symbol,
        |    (10 * n_bullet_lines < 9 * n_lines) AS ok_bullet,
        |    (10 * n_ellipsis_lines < 3 * n_lines) AS ok_ellipsis,
        |    (5 * n_alpha_words >= 4 * n_words) AS ok_alpha,
        |    (n_stop_distinct >= 2) AS ok_stop
        |  FROM m)
        |SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_sym, n_lines,
        |  n_bullet_lines, n_ellipsis_lines, n_stop_distinct,
        |  ok_words, ok_mean_len, ok_symbol, ok_bullet, ok_ellipsis, ok_alpha, ok_stop,
        |  (ok_words AND ok_mean_len AND ok_symbol AND ok_bullet AND ok_ellipsis
        |    AND ok_alpha AND ok_stop) AS pass
        |FROM f ORDER BY doc_id""".stripMargin,

    // Full SQL re-derivation: same quality/token expressions as the
    // txt_quality / txt_token_estimate oracles, rolled up per source.
    // Integer sums only (token counts, char counts, pass counts) — no
    // float accumulation; avg_chars is one IEEE division on both sides.
    "tdp_corpus_stats" ->
      """WITH tk AS (
        |  SELECT source, lang, n_chars, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source, lang, n_chars, text, len(toks) AS n_tokens,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that')))::DOUBLE
        |      / len(toks) AS stopword_ratio,
        |    (len(text) - len(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE
        |      / len(text) AS punct_ratio
        |  FROM tk),
        |q AS (
        |  SELECT source, lang, n_chars,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')) AS tok_est,
        |    (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * 0.4::DOUBLE
        |      + (CASE WHEN stopword_ratio > 0.02 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        |      + (CASE WHEN punct_ratio < 0.2 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality_score
        |  FROM m)
        |SELECT source,
        |  count(*)::BIGINT AS n_docs,
        |  sum(tok_est)::BIGINT AS total_tokens_est,
        |  count(DISTINCT lang)::BIGINT AS n_langs,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  sum(CASE WHEN quality_score >= 0.7 THEN 1 ELSE 0 END)::BIGINT AS n_quality_pass,
        |  sum(n_chars)::DOUBLE / count(*) AS avg_chars
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    // Windowed-drift fixture twin: same grid/fold/decimal derivation
    // over inline VALUES (timestamps parsed identically on both engines).
    "txt_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS norm_md5,
        |  nfc_normalize(text) IS NOT DISTINCT FROM text AS unchanged
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Fixture twin: chr() builds the decomposed inputs so the SQL text
    // stays ASCII; codes 769=U+0301, 233=U+00E9, 778=U+030A, 8491=U+212B.
    "txt_normalize_fx" -> PinnedOracles.sql("txt_normalize_fx"),

    "txt_langid" ->
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
        |b AS (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS hm FROM h)
        |SELECT doc_id, lang,
        |  CASE WHEN hm <= 0 THEN 'und'
        |       WHEN h_de = hm THEN 'de' WHEN h_en = hm THEN 'en' WHEN h_es = hm THEN 'es'
        |       WHEN h_fr = hm THEN 'fr' ELSE 'zh' END AS predicted
        |FROM b ORDER BY doc_id""".stripMargin,

    // Repetition: same shingle/window terms, same single IEEE division.
    "txt_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |      THEN len(list_distinct(list_transform(range(1, len(t) - 1),
        |        i -> array_to_string(t[i:i+2], ' '))))
        |      ELSE 1 END AS nd,
        |    greatest(len(t) - 2, 1) AS total
        |  FROM toks)
        |SELECT doc_id, 1.0::DOUBLE - nd::DOUBLE / total::DOUBLE AS rep3_ratio
        |FROM r ORDER BY doc_id""".stripMargin,

    // Dataset-card re-derivation: the corpus-stats token estimate, the
    // gopher-rules flag chain rolled up per source, and the distinct-2
    // ratio, joined on source.
    "tdp_dataset_card" ->
      """WITH stats AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')))::BIGINT AS total_tokens_est,
        |    count(DISTINCT lang)::BIGINT AS n_langs
        |  FROM documents GROUP BY source),
        |gt AS (
        |  SELECT doc_id, source, text AS t,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE text IS NOT NULL),
        |gm AS (
        |  SELECT doc_id, source,
        |    len(toks)::BIGINT AS n_words,
        |    list_reduce(list_prepend(0, list_transform(toks, x -> len(x))),
        |                (a, b) -> a + b)::BIGINT AS sum_word_len,
        |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
        |    ((len(t) - len(replace(t, '#', '')))
        |      + (len(t) - len(replace(t, '...', ''))) // 3)::BIGINT AS n_sym,
        |    len(lines)::BIGINT AS n_lines,
        |    len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]')))::BIGINT AS n_bul,
        |    len(list_filter(lines, x -> x LIKE '%...'))::BIGINT AS n_ell,
        |    len(list_filter(list_distinct(toks),
        |        x -> x IN ('the','a','of','and','to','in','is','that')))::BIGINT AS n_stop
        |  FROM gt),
        |gp AS (
        |  SELECT source,
        |    sum(CASE WHEN n_words >= 5 AND n_words <= 100000
        |      AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
        |      AND 10 * n_sym < n_words
        |      AND 10 * n_bul < 9 * n_lines
        |      AND 10 * n_ell < 3 * n_lines
        |      AND 5 * n_alpha_words >= 4 * n_words
        |      AND n_stop >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_gopher_pass
        |  FROM gm GROUP BY source),
        |dk AS (
        |  SELECT source, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |dg AS (
        |  SELECT source, array_to_string(t[i:i+1], ' ') AS gram
        |  FROM dk, LATERAL unnest(generate_series(1, len(t) - 1)) AS s(i)
        |  WHERE len(t) >= 2),
        |dc AS (SELECT source, gram, count(*)::BIGINT AS c FROM dg GROUP BY source, gram),
        |dv AS (
        |  SELECT source, count(*)::DOUBLE / sum(c)::DOUBLE AS distinct_ratio
        |  FROM dc GROUP BY source)
        |SELECT s.source, s.n_docs, s.total_tokens_est, s.n_langs,
        |  coalesce(gp.n_gopher_pass, 0)::BIGINT AS n_gopher_pass, dv.distinct_ratio
        |FROM stats s
        |LEFT JOIN gp ON gp.source = s.source
        |LEFT JOIN dv ON dv.source = s.source
        |ORDER BY s.source""".stripMargin,

    // Length-bucket re-derivation: the txt_token_estimate tokenizer, the
    // same clamp and power-of-two CASE ladder, exact integer sums.
    "tdp_length_buckets" ->
      """WITH m AS (
        |  SELECT least(greatest(
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')), 1), 16384) AS len
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT len,
        |    CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
        |         WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
        |         WHEN len <= 256 THEN 256 WHEN len <= 512 THEN 512
        |         WHEN len <= 1024 THEN 1024 WHEN len <= 2048 THEN 2048
        |         WHEN len <= 4096 THEN 4096 WHEN len <= 8192 THEN 8192
        |         ELSE 16384 END AS bucket
        |  FROM m)
        |SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
        |  sum(len)::BIGINT AS sum_tokens,
        |  sum(bucket - len)::BIGINT AS sum_padding,
        |  sum(len)::DOUBLE / (sum(len) + sum(bucket - len))::DOUBLE AS efficiency
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Independent skyline re-derivation: NOT EXISTS dominance over the
    // full quadratic space — the engine's staircase prune must agree.
    "tdp_pareto_frontier" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS n_types,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tok
        |  FROM documents)
        |SELECT t.doc_id, t.n_types, t.n_tok FROM m t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM m o
        |  WHERE o.n_types >= t.n_types AND o.n_tok <= t.n_tok
        |    AND (o.n_types > t.n_types OR o.n_tok < t.n_tok))
        |ORDER BY t.n_types DESC, t.doc_id""".stripMargin,

    // Monotonicity re-derivation: same staircase arithmetic — per-cent
    // counts, cumulative band cut, integer rates, lag violation flag.
    "txt_source_percentile" ->
      """SELECT doc_id, source, n_chars,
        |  (count(*) OVER (PARTITION BY source ORDER BY n_chars
        |                  RANGE UNBOUNDED PRECEDING) * 1000000000)
        |    // count(*) OVER (PARTITION BY source) AS pct_n9
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Compression-ratio re-derivation: the txt_token_estimate tokenizer,
    // exact sums, one IEEE division.
    "txt_compression_ratio" ->
      """SELECT source,
        |  sum(len(text))::BIGINT AS total_chars,
        |  sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')))::BIGINT AS total_tokens_est,
        |  CASE WHEN sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+'))) > 0
        |    THEN sum(len(text))::DOUBLE
        |      / sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |        + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')))::DOUBLE
        |  END AS chars_per_token
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // TF-IDF re-derivation: exact tf/df/N counts, idf the 6-dp-rounded
    // ln ratio on both engines, score one IEEE multiply, rank over the
    // identical (score, term) order.
    "txt_tfidf_terms" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT source, term, count(*)::BIGINT AS tf FROM tk GROUP BY source, term),
        |ng AS (SELECT count(DISTINCT source)::BIGINT AS n FROM tf),
        |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.source, tf.term, tf.tf,
        |    round(ln((1.0::DOUBLE + ng.n) / (1.0::DOUBLE + df.df)), 6) AS idf
        |  FROM tf CROSS JOIN ng JOIN df USING (term)),
        |r AS (
        |  SELECT source, term, tf, idf, tf::DOUBLE * idf AS score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY tf::DOUBLE * idf DESC, term ASC) AS rank
        |  FROM sc)
        |SELECT source, rank::BIGINT AS rank, term, tf, idf, score
        |FROM r WHERE rank <= 10
        |ORDER BY source, rank""".stripMargin,

    // Distinct-n re-derivation: the terms tokenizer (regex whitespace
    // split of the lowercased text), every bigram window non-distinct,
    // one (source, gram) aggregation, exact counts + one IEEE division.
    "txt_distinct_ngrams" ->
      """WITH tk AS (
        |  SELECT source, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT source, array_to_string(t[i:i+1], ' ') AS gram
        |  FROM tk, LATERAL unnest(generate_series(1, len(t) - 1)) AS s(i)
        |  WHERE len(t) >= 2),
        |c AS (SELECT source, gram, count(*)::BIGINT AS c FROM g GROUP BY source, gram)
        |SELECT source, sum(c)::BIGINT AS n_grams, count(*)::BIGINT AS n_distinct,
        |  count(*)::DOUBLE / sum(c)::DOUBLE AS distinct_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // Dup-mass re-derivation: fingerprint multiplicity joined back, per-
    // source rollup, one IEEE ratio.
    "txt_ngram_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT id, unnest(list_distinct(CASE WHEN len(t) >= 3
        |    THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
        |    ELSE [array_to_string(t, ' ')] END)) AS shingle
        |  FROM tk),
        |df AS (SELECT shingle, count(*)::BIGINT AS df FROM sh GROUP BY shingle)
        |SELECT id AS doc_id, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS novelty
        |FROM sh JOIN df USING (shingle)
        |GROUP BY id ORDER BY id""".stripMargin,

    "txt_fingerprint" ->
      """WITH tk AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_fp,
        |  list_reduce(list_prepend(0, list_transform(toks,
        |    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 2147483647)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
        |FROM tk ORDER BY doc_id""".stripMargin,

    "tdp_scd2_merge" ->
      """WITH hist_open AS (
        |  SELECT doc_id AS key, text AS value, 0::BIGINT AS valid_from,
        |    NULL::BIGINT AS valid_to
        |  FROM documents WHERE doc_id % 3 <> 0),
        |hist_closed AS (
        |  SELECT doc_id AS key, 'old ' || text AS value, (-100)::BIGINT AS valid_from,
        |    0::BIGINT AS valid_to
        |  FROM documents WHERE doc_id % 10 = 0),
        |ch AS (
        |  SELECT doc_id AS key,
        |    CASE WHEN doc_id % 5 = 0 THEN text ELSE text || ' v2' END AS cv,
        |    100::BIGINT AS cts,
        |    CASE WHEN doc_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM documents WHERE doc_id % 2 = 0),
        |j AS (
        |  SELECT coalesce(o.key, c.key) AS key, o.value AS ov, o.valid_from AS ofrom,
        |    c.cv, c.cts, c.op, (o.key IS NOT NULL) AS has_open, (c.key IS NOT NULL) AS has_ch
        |  FROM hist_open o FULL OUTER JOIN ch c ON o.key = c.key),
        |out_old AS (
        |  SELECT key, ov AS value, ofrom AS valid_from,
        |    CASE WHEN NOT has_ch OR (op = 'upsert' AND ov IS NOT DISTINCT FROM cv)
        |         THEN NULL::BIGINT ELSE cts END AS valid_to
        |  FROM j WHERE has_open),
        |out_new AS (
        |  SELECT key, cv AS value, cts AS valid_from, NULL::BIGINT AS valid_to
        |  FROM j WHERE has_ch AND op = 'upsert'
        |    AND (NOT has_open OR ov IS DISTINCT FROM cv))
        |SELECT key, value, valid_from, valid_to FROM hist_closed
        |UNION ALL SELECT * FROM out_old
        |UNION ALL SELECT * FROM out_new
        |ORDER BY key, valid_from""".stripMargin,

    "txt_token_estimate" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')) AS n_tokens_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tdp_contamination_rate" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT id,
        |    unnest(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
        |      ELSE [array_to_string(t, ' ')] END)) AS shingle
        |  FROM tk),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 20 = 0),
        |ov AS (
        |  SELECT s.id, count(*) AS nn FROM sh s JOIN bench b USING (shingle)
        |  WHERE s.id % 20 <> 0 GROUP BY s.id),
        |fl AS (
        |  SELECT tk.id, tk.source, coalesce(ov.nn, 0) > 0 AS contaminated
        |  FROM tk LEFT JOIN ov USING (id) WHERE tk.id % 20 <> 0),
        |g AS (
        |  SELECT source::VARCHAR AS "group", count(*)::BIGINT AS n,
        |    sum(contaminated::INT)::BIGINT AS k
        |  FROM fl GROUP BY 1),
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

    "tdp_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT id,
        |    unnest(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
        |      ELSE [array_to_string(t, ' ')] END)) AS shingle
        |  FROM tk),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 20 = 0),
        |corpus AS (SELECT id FROM tk WHERE id % 20 <> 0),
        |ov AS (
        |  SELECT s.id, count(*) AS n FROM sh s JOIN bench b USING (shingle)
        |  WHERE s.id % 20 <> 0 GROUP BY s.id)
        |SELECT c.id, coalesce(ov.n, 0) AS n_bench_overlaps,
        |  coalesce(ov.n, 0) > 0 AS contaminated
        |FROM corpus c LEFT JOIN ov USING (id) ORDER BY id""".stripMargin,

    "tdp_pack_sequences" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id AS id,
        |    (len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')))::BIGINT AS tok,
        |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 64)::INTEGER AS shard
        |  FROM documents),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY id) AS rn FROM base),
        |state(shard, rn, id, tok, pack, fill) AS (
        |  SELECT shard, rn, id, tok, 0::BIGINT, tok FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT r.shard, r.rn, r.id, r.tok,
        |    CASE WHEN s.fill > 0 AND s.fill + r.tok > 2048 THEN s.pack + 1 ELSE s.pack END,
        |    CASE WHEN s.fill > 0 AND s.fill + r.tok > 2048 THEN r.tok ELSE s.fill + r.tok END
        |  FROM ranked r JOIN state s ON r.shard = s.shard AND r.rn = s.rn + 1)
        |SELECT id AS doc_id, shard, pack FROM state ORDER BY doc_id""".stripMargin,

    // Training-shard plan re-derivation: md5 min-id dedup, the epoch-1
    // md5-hash permutation as a row_number, round-robin shards, and the
    // same recursive greedy packing as tdp_pack_sequences but walking the
    // epoch order within each shard.
    "tdp_training_shards" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |    (len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')))::BIGINT AS tok,
        |    md5(text) AS th
        |  FROM documents),
        |surv AS (SELECT th, min(doc_id) AS doc_id FROM base GROUP BY th),
        |d AS (SELECT b.doc_id, b.tok FROM base b JOIN surv s USING (th, doc_id)),
        |ord AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(doc_id::VARCHAR || ':1'), 1, 8))::BIGINT, doc_id) - 1
        |      AS pos
        |  FROM d),
        |sh AS (
        |  SELECT doc_id, tok, pos, (pos % 8)::INTEGER AS shard,
        |    row_number() OVER (PARTITION BY pos % 8 ORDER BY pos) AS rn
        |  FROM ord),
        |state(shard, rn, doc_id, tok, pos, pack, fill) AS (
        |  SELECT shard, rn, doc_id, tok, pos, 0::BIGINT, tok FROM sh WHERE rn = 1
        |  UNION ALL
        |  SELECT r.shard, r.rn, r.doc_id, r.tok, r.pos,
        |    CASE WHEN s.fill > 0 AND s.fill + r.tok > 2048 THEN s.pack + 1 ELSE s.pack END,
        |    CASE WHEN s.fill > 0 AND s.fill + r.tok > 2048 THEN r.tok ELSE s.fill + r.tok END
        |  FROM sh r JOIN state s ON r.shard = s.shard AND r.rn = s.rn + 1)
        |SELECT shard, pack, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS pack_tokens,
        |  min(pos)::BIGINT AS first_pos
        |FROM state GROUP BY shard, pack ORDER BY shard, pack""".stripMargin,

    "tdp_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0
        |  < CASE WHEN lang = 'de' THEN 0.25 WHEN lang = 'en' THEN 0.5 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin,

    "tdp_mixture_plan" ->
      """WITH a AS (
        |  SELECT source, sum(length(text))::BIGINT AS total_tokens,
        |    CASE WHEN source = 'src1' THEN '0.6'::DOUBLE
        |         WHEN source = 'src2' THEN '0.4'::DOUBLE
        |         ELSE '0.0'::DOUBLE END AS weight
        |  FROM documents GROUP BY source)
        |SELECT source, total_tokens, weight,
        |  CASE WHEN coalesce(total_tokens, 0) <= 0 OR weight = 0.0 THEN '0.0'::DOUBLE
        |       ELSE least('1.0'::DOUBLE, '10000.0'::DOUBLE * weight / total_tokens::DOUBLE)
        |  END AS keep_frac
        |FROM a ORDER BY source""".stripMargin,

    "tdp_mixture_sample" ->
      """WITH a AS (
        |  SELECT source AS mx_src, sum(length(text))::BIGINT AS total_tokens,
        |    CASE WHEN source = 'src1' THEN '0.6'::DOUBLE
        |         WHEN source = 'src2' THEN '0.4'::DOUBLE
        |         ELSE '0.0'::DOUBLE END AS weight
        |  FROM documents GROUP BY source
        |), p AS (
        |  SELECT mx_src,
        |    CASE WHEN coalesce(total_tokens, 0) <= 0 OR weight = 0.0 THEN '0.0'::DOUBLE
        |         ELSE least('1.0'::DOUBLE, '10000.0'::DOUBLE * weight / total_tokens::DOUBLE)
        |    END AS keep_frac
        |  FROM a)
        |SELECT doc_id, source FROM documents d JOIN p ON d.source = p.mx_src
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0
        |  < keep_frac
        |ORDER BY doc_id""".stripMargin,

    // Temperature mixture: shares^alpha rounded to 9 dp, decimal-exact
    // normalizer, every division in the engine's association order.
    "tdp_temperature_plan" ->
      """WITH tot AS (
        |  SELECT source,
        |    sum(CASE WHEN length(text) > 0 THEN length(text)::BIGINT ELSE 0 END)::BIGINT
        |      AS s_tok
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |g AS (SELECT coalesce(sum(s_tok), 0)::BIGINT AS gs FROM tot),
        |w AS (
        |  SELECT source, s_tok,
        |    CASE WHEN g.gs <= 0 OR s_tok <= 0 THEN '0.0'::DOUBLE
        |         ELSE round(pow(s_tok::DOUBLE / g.gs::DOUBLE, '0.5'::DOUBLE), 6) END AS w
        |  FROM tot CROSS JOIN g),
        |nw AS (SELECT sum(w::DECIMAL(28,9))::DOUBLE AS tw FROM w),
        |q AS (
        |  SELECT source, s_tok, w,
        |    CASE WHEN nw.tw <= 0.0 THEN '0.0'::DOUBLE ELSE w / nw.tw END AS q
        |  FROM w CROSS JOIN nw)
        |SELECT source, s_tok, w, q,
        |  CASE WHEN s_tok <= 0 THEN '0.0'::DOUBLE
        |       ELSE least('1.0'::DOUBLE, '10000.0'::DOUBLE * q / s_tok::DOUBLE) END
        |    AS keep_frac
        |FROM q ORDER BY source""".stripMargin,

    "tdp_temperature_mixture" ->
      """WITH tot AS (
        |  SELECT source,
        |    sum(CASE WHEN length(text) > 0 THEN length(text)::BIGINT ELSE 0 END)::BIGINT
        |      AS s_tok
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |g AS (SELECT coalesce(sum(s_tok), 0)::BIGINT AS gs FROM tot),
        |w AS (
        |  SELECT source, s_tok,
        |    CASE WHEN g.gs <= 0 OR s_tok <= 0 THEN '0.0'::DOUBLE
        |         ELSE round(pow(s_tok::DOUBLE / g.gs::DOUBLE, '0.5'::DOUBLE), 6) END AS w
        |  FROM tot CROSS JOIN g),
        |nw AS (SELECT sum(w::DECIMAL(28,9))::DOUBLE AS tw FROM w),
        |q AS (
        |  SELECT source, s_tok,
        |    CASE WHEN nw.tw <= 0.0 THEN '0.0'::DOUBLE ELSE w / nw.tw END AS q
        |  FROM w CROSS JOIN nw),
        |p AS (
        |  SELECT source,
        |    CASE WHEN s_tok <= 0 THEN '0.0'::DOUBLE
        |         ELSE least('1.0'::DOUBLE, '10000.0'::DOUBLE * q / s_tok::DOUBLE) END
        |      AS keep_frac
        |  FROM q)
        |SELECT doc_id, source FROM documents d JOIN p USING (source)
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0
        |  < keep_frac
        |ORDER BY doc_id""".stripMargin,

    // Exact interpolated quantiles: both engines use lower +
    // (upper-lower)*frac over the sorted values.
    "txt_length_quantiles" ->
      """SELECT lang,
        |  quantile_cont(length(text)::DOUBLE, 0.5) AS p50,
        |  quantile_cont(length(text)::DOUBLE, 0.9) AS p90,
        |  quantile_cont(length(text)::DOUBLE, 0.99) AS p99,
        |  count(*) AS n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Chunking: same token split, stride arithmetic, and 1-based
    // inclusive slicing on both engines (Spark slice(start,len) ==
    // DuckDB list[start:start+len-1]).
    "tdp_chunk_documents" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    greatest(1, floor((len(toks)::BIGINT - 10 + 39)::DOUBLE / 40.0)::BIGINT) AS nc
        |  FROM d
        |), e AS (
        |  SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c
        |)
        |SELECT doc_id, i AS chunk_id,
        |  array_to_string(toks[(i*40+1):(i*40+50)], ' ') AS chunk_text,
        |  len(toks[(i*40+1):(i*40+50)])::INT AS n_tokens
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,

    "tdp_epoch_shuffle" ->
      """SELECT doc_id, source,
        |  row_number() OVER (ORDER BY
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':3'), 1, 8))::BIGINT, doc_id) - 1
        |    AS shuffle_pos
        |FROM documents ORDER BY shuffle_pos""".stripMargin,

    // PII scrub: identical injection + email->IP->phone redaction order,
    // 'g' flags (DuckDB replaces first match only by default).
    "tdp_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id::VARCHAR || '@example.com or +1 (555) 010-' ||
        |    lpad(doc_id::VARCHAR, 4, '0') || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.1' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[(]?[0-9][-0-9 ()]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips
        |FROM p ORDER BY doc_id""".stripMargin,

    // Mean pooling expected table (sf0.01-pinned, gen_values_oracle.py):
    // a SQL re-derivation is NOT used because DuckDB's double->DECIMAL
    // cast rounds half-even while Spark rounds half-up — one en-group
    // value lands exactly on the 1e-12 boundary. Regenerate if the
    // operator or the embeddings table changes.
    "tdp_decon_spans" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT id, unnest(range(0, len(t) - 4)) AS start, t
        |  FROM tk WHERE len(t) >= 5),
        |h AS (
        |  SELECT id, start, md5(array_to_string(t[start+1:start+5], ' ')) AS gh FROM g),
        |bench AS (
        |  SELECT DISTINCT gh FROM h WHERE id % 20 = 0),
        |d AS (
        |  SELECT id, start FROM h
        |  WHERE id % 20 <> 0 AND gh IN (SELECT gh FROM bench)),
        |s AS (
        |  SELECT id, start,
        |    CASE WHEN lag(start) OVER w IS NULL OR start > lag(start) OVER w + 5
        |         THEN 1 ELSE 0 END AS ns
        |  FROM d WINDOW w AS (PARTITION BY id ORDER BY start)),
        |i AS (
        |  SELECT *, sum(ns) OVER
        |    (PARTITION BY id ORDER BY start ROWS UNBOUNDED PRECEDING) AS sp FROM s)
        |SELECT id, min(start)::INT AS span_start, (max(start) + 4)::INT AS span_end,
        |  (max(start) + 4 - min(start) + 1)::INT AS span_tokens, count(*) AS n_windows
        |FROM i GROUP BY id, sp
        |ORDER BY id, span_start""".stripMargin,

    // Removal twin: covered positions are the union of duplicated windows
    // (identical to the merged spans' union), excised via an indexed
    // list_filter; span-free docs pass through with original text.
    "tdp_remove_dup_spans" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT id, unnest(range(0, len(t) - 4)) AS start, t
        |  FROM tk WHERE len(t) >= 5),
        |h AS (
        |  SELECT id, start, md5(array_to_string(t[start+1:start+5], ' ')) AS gh FROM g),
        |d AS (
        |  SELECT id, start FROM (
        |    SELECT id, start, count(*) OVER (PARTITION BY gh) AS n FROM h) WHERE n >= 2),
        |cov AS (
        |  SELECT DISTINCT id, unnest(range(start, start + 5)) AS pos FROM d),
        |cl AS (
        |  SELECT id, count(*) AS nrem, list(pos) AS covs FROM cov GROUP BY id)
        |SELECT tk.id,
        |  coalesce(array_to_string(
        |    list_filter(t, (x, i) -> NOT list_contains(covs, i - 1)), ' '), '')
        |    AS clean_text,
        |  cl.nrem AS n_removed_tokens
        |FROM tk JOIN cl ON tk.id = cl.id
        |UNION ALL
        |SELECT id, text AS clean_text, 0 AS n_removed_tokens
        |FROM tk WHERE id NOT IN (SELECT id FROM cl)
        |ORDER BY id""".stripMargin,

    // ExactSubstr-apply re-derivation: the dd_substring_dedup quadratic
    // chain, keep=false occurrences only, then the tdp_remove_dup_spans
    // rebuild tail.
    "tdp_substring_dedup_apply" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT id, unnest(range(0, len(t) - 4)) AS start, t
        |  FROM tk WHERE len(t) >= 5),
        |h AS (
        |  SELECT id, start, md5(array_to_string(t[start+1:start+5], ' ')) AS gh FROM g),
        |d AS (
        |  SELECT DISTINCT a.id, a.start
        |  FROM h a JOIN h b ON a.gh = b.gh AND a.id <> b.id),
        |s AS (
        |  SELECT id, start,
        |    CASE WHEN lag(start) OVER w IS NULL OR start > lag(start) OVER w + 5
        |         THEN 1 ELSE 0 END AS ns
        |  FROM d WINDOW w AS (PARTITION BY id ORDER BY start)),
        |i AS (
        |  SELECT *, sum(ns) OVER
        |    (PARTITION BY id ORDER BY start ROWS UNBOUNDED PRECEDING) AS sp FROM s),
        |spans AS (
        |  SELECT id, min(start)::INT AS span_start, (max(start) + 4)::INT AS span_end
        |  FROM i GROUP BY id, sp),
        |ct AS (
        |  SELECT spans.id, span_start, span_end,
        |    md5(array_to_string(tk.t[span_start+1:span_end+1], ' ')) AS cluster
        |  FROM spans JOIN tk ON tk.id = spans.id),
        |nc AS (
        |  SELECT id, span_start, span_end FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY cluster ORDER BY id, span_start) AS rk FROM ct)
        |  WHERE rk > 1),
        |cov AS (
        |  SELECT DISTINCT id, unnest(range(span_start, span_end + 1)) AS pos FROM nc),
        |cl AS (
        |  SELECT id, count(*) AS nrem, list(pos) AS covs FROM cov GROUP BY id)
        |SELECT tk.id,
        |  coalesce(array_to_string(
        |    list_filter(t, (x, i) -> NOT list_contains(covs, i - 1)), ' '), '')
        |    AS clean_text,
        |  cl.nrem AS n_removed_tokens
        |FROM tk JOIN cl ON tk.id = cl.id
        |UNION ALL
        |SELECT id, text AS clean_text, 0 AS n_removed_tokens
        |FROM tk WHERE id NOT IN (SELECT id FROM cl)
        |ORDER BY id""".stripMargin,

    // Hash split: same md5-prefix uniform draw; the 0.8/0.9 boundaries
    // have no 1/2^32 lattice point inside their float-sum gap.
    "tdp_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN h < 0.8 THEN 'train' WHEN h < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // Split-leakage re-derivation: the dd_minhash_lsh pair CTEs + the
    // tdp_hash_split assignment, joined and counted per split pairing.
    "tdp_split_leakage" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
         |      ELSE [array_to_string(t, ' ')] END)) AS shingle
         |  FROM toks),
         |hs AS (
         |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
         |  FROM hs CROSS JOIN (SELECT * FROM (VALUES $minhashCoeffs) AS t(i, a, b)) co
         |  GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
         |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
         |  FROM cand
         |  JOIN mh ma ON ma.doc_id = id_a
         |  JOIN mh mb ON mb.doc_id = id_b AND mb.i = ma.i
         |  GROUP BY id_a, id_b),
         |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN h < 0.8 THEN 'train' WHEN h < 0.9 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 AS h
         |    FROM documents)),
         |lab AS (
         |  SELECT least(sa.split, sb.split) AS split_a,
         |    greatest(sa.split, sb.split) AS split_b
         |  FROM pairs JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b)
         |SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
         |  split_a <> split_b AS crosses_split
         |FROM lab GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,

    "txt_bpe_encode" -> BpeEncodeSql,
    "txt_bpe_reload" -> BpeEncodeSql,

    "tdp_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 10 <> 0),
        |v2 AS (SELECT doc_id AS id,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END AS text
        |       FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(v1.id, v2.id) AS id,
        |  CASE WHEN v1.id IS NULL THEN 'added'
        |       WHEN v2.id IS NULL THEN 'removed'
        |       WHEN md5(v1.text) IS NOT DISTINCT FROM md5(v2.text) THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.id = v2.id
        |ORDER BY id""".stripMargin,

    "tdp_sketch_distinct" ->
      """WITH
        |he AS (SELECT DISTINCT ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT AS h
        |       FROM events WHERE event_id IS NOT NULL),
        |ht AS (SELECT DISTINCT ('0x' || substr(md5(event_type), 1, 8))::BIGINT AS h
        |       FROM events WHERE event_type IS NOT NULL),
        |hu AS (SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h
        |       FROM events WHERE user_id IS NOT NULL),
        |ke AS (SELECT h FROM he ORDER BY h LIMIT 64),
        |kt AS (SELECT h FROM ht ORDER BY h LIMIT 64),
        |ku AS (SELECT h FROM hu ORDER BY h LIMIT 64),
        |a AS (
        |  SELECT 'event_id' AS column_name, count(*) AS n_kmv, max(h) AS kth_hash FROM ke
        |  UNION ALL
        |  SELECT 'event_type', count(*), max(h) FROM kt
        |  UNION ALL
        |  SELECT 'user_id', count(*), max(h) FROM ku)
        |SELECT column_name, 64 AS k, n_kmv, kth_hash,
        |  CASE WHEN n_kmv < 64 THEN n_kmv::DOUBLE
        |       ELSE 63.0 * 4294967296.0 / kth_hash::DOUBLE END AS estimate
        |FROM a ORDER BY column_name""".stripMargin,

    "tdp_heavy_hitters" ->
      """SELECT user_id AS key, count(*) AS n FROM events
        |GROUP BY user_id ORDER BY n DESC, key ASC LIMIT 10""".stripMargin,

    // weight table rendered from the SAME source seq the operator uses
    "txt_quality_model" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
         |  FROM documents),
         |b AS (SELECT doc_id,
         |        [${graft.operators.QualityModel.weightsMilli.mkString(", ")}]
         |          [((('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1)::INT] AS w
         |      FROM tok),
         |s AS (SELECT doc_id, sum(w)::BIGINT AS sw, count(*)::BIGINT AS n FROM b GROUP BY doc_id)
         |SELECT d.doc_id AS id, coalesce(s.n, 0) AS n_tokens,
         |  CASE WHEN s.n IS NULL OR s.n = 0 THEN 0.0
         |       ELSE sw::DOUBLE / 1000.0 / n END AS score
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY id""".stripMargin,

    "txt_quality_ensemble" -> qualityEnsembleSql,

    // Perplexity buckets: the shared LM chain, quantile_cont thresholds
    // (the proven percentile interpolation parity), two comparisons.
    "txt_ppl_buckets" ->
      (lmScoreCtes("(SELECT doc_id AS id, text FROM documents)", 20, 400) + """,
        |lmsc AS (
        |  SELECT d.id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |    ((a.u * 2 + a.n_tokens) // (a.n_tokens * 2))::DOUBLE / 1000000 AS lm_score
        |  FROM d LEFT JOIN agg a ON d.id = a.id),
        |th AS (
        |  SELECT quantile_cont(lm_score, '0.1'::DOUBLE) AS t_head,
        |         quantile_cont(lm_score, '0.6'::DOUBLE) AS t_mid
        |  FROM lmsc WHERE lm_score IS NOT NULL)
        |SELECT id AS doc_id, n_tokens, lm_score,
        |  CASE WHEN lm_score IS NULL THEN NULL
        |       WHEN lm_score <= t_head THEN 'head'
        |       WHEN lm_score <= t_mid THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM lmsc CROSS JOIN th ORDER BY doc_id""".stripMargin),

    "txt_boilerplate_scrub" -> boilerplateScrubSql(
      "(SELECT doc_id AS id, text FROM documents)", "' '", 0.8),

    // VALUES pin (fx-twin policy: a pinned output is what makes a twin
    // environment- and regeneration-proof); live re-derivation below in
    // rederiveSql.
    "txt_boilerplate_fx" -> PinnedOracles.sql("txt_boilerplate_fx"),

    // VALUES pin: the live re-derivation (ensembleCalibrationSql, in
    // rederiveSql) mixes the LM ln() with the calibration contract's
    // round(.., 9) — the combination the round-8 lint forbids live.
    "txt_ensemble_calibration" -> PinnedOracles.sql("txt_ensemble_calibration"),

    // Quality-gate rollup: the ensemble CTE chain, one boolean gate at
    // 0.5 (identical doubles on both engines), exact-count pass rates.
    "tdp_quality_gate_stats" ->
      (ensembleCtes + """
        |SELECT d2.source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN e.ensemble IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_scored,
        |  sum(CASE WHEN e.ensemble >= 0.5::DOUBLE THEN 1 ELSE 0 END)::BIGINT AS n_pass,
        |  sum(CASE WHEN e.ensemble >= 0.5::DOUBLE THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE AS pass_rate
        |FROM ens e JOIN documents d2 ON d2.doc_id = e.doc_id
        |GROUP BY d2.source ORDER BY d2.source""".stripMargin),

    "tdp_sample_per_group" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,

    "tdp_quantile_sketch" ->
      """WITH b AS (
        |  SELECT n_chars // 200 AS bucket, count(*)::BIGINT AS n
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT a.bucket, sum(b.n)::BIGINT AS cum
        |  FROM b a JOIN b ON b.bucket <= a.bucket GROUP BY a.bucket),
        |t AS (SELECT sum(n)::BIGINT AS total FROM b),
        |q AS (SELECT unnest(['0.5'::DOUBLE, '0.9'::DOUBLE, '0.99'::DOUBLE]) AS q)
        |SELECT q, min(bucket) AS bucket, min(bucket) * 200 + 100 AS approx
        |FROM q CROSS JOIN t JOIN c ON c.cum >= q.q * t.total
        |GROUP BY q ORDER BY q""".stripMargin,

    "tdp_zorder" ->
      """WITH q AS (
        |  SELECT event_id,
        |    (least(greatest(user_id, 0), 100000) - least(greatest(user_id, 0), 100000) % 391) / 391 AS qu,
        |    ((o - o % 123525000001) / 123525000001) AS qt
        |  FROM (SELECT event_id, user_id,
        |          least(greatest(epoch_us(ts), 1704067200000000), 1735689600000000)
        |            - 1704067200000000 AS o
        |        FROM events))
        |SELECT event_id,
        |  -- DuckDB bitwise operators share one precedence level and bind
        |  -- left-to-right, so every term is fully parenthesized
        |  ((((CAST(qu AS BIGINT) >> 0) & 1) << 0) | (((CAST(qt AS BIGINT) >> 0) & 1) << 1)
        |  | (((CAST(qu AS BIGINT) >> 1) & 1) << 2) | (((CAST(qt AS BIGINT) >> 1) & 1) << 3)
        |  | (((CAST(qu AS BIGINT) >> 2) & 1) << 4) | (((CAST(qt AS BIGINT) >> 2) & 1) << 5)
        |  | (((CAST(qu AS BIGINT) >> 3) & 1) << 6) | (((CAST(qt AS BIGINT) >> 3) & 1) << 7)
        |  | (((CAST(qu AS BIGINT) >> 4) & 1) << 8) | (((CAST(qt AS BIGINT) >> 4) & 1) << 9)
        |  | (((CAST(qu AS BIGINT) >> 5) & 1) << 10) | (((CAST(qt AS BIGINT) >> 5) & 1) << 11)
        |  | (((CAST(qu AS BIGINT) >> 6) & 1) << 12) | (((CAST(qt AS BIGINT) >> 6) & 1) << 13)
        |  | (((CAST(qu AS BIGINT) >> 7) & 1) << 14) | (((CAST(qt AS BIGINT) >> 7) & 1) << 15)) AS z
        |FROM q ORDER BY event_id""".stripMargin,

    "tdp_sketch_by_group" ->
      """WITH g AS (SELECT DISTINCT event_type FROM events),
        |h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |a AS (SELECT event_type, count(*) AS n_kmv, max(h) AS kth_hash
        |      FROM r WHERE rn <= 32 GROUP BY event_type)
        |-- a group whose values are ALL null has no h rows but still gets
        |-- an empty-sketch row (n_kmv 0, estimate 0.0), like the operator
        |SELECT g.event_type, coalesce(a.n_kmv, 0) AS n_kmv, a.kth_hash,
        |  CASE WHEN a.n_kmv IS NULL THEN 0.0
        |       WHEN a.n_kmv < 32 THEN a.n_kmv::DOUBLE
        |       ELSE 31.0 * 4294967296.0 / a.kth_hash::DOUBLE END AS estimate
        |FROM g LEFT JOIN a ON g.event_type IS NOT DISTINCT FROM a.event_type
        |ORDER BY g.event_type""".stripMargin,

    // BM25: postings restricted to the query terms, Lucene-variant idf,
    // document length from ALL terms; round(6) for ln/division ULP parity.
    "txt_bm25_topk" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |st AS (SELECT count(t)::BIGINT AS n_docs, avg(len(t)) AS avgdl FROM d),
        |post AS (SELECT id, len(t) AS dl, unnest(t) AS term FROM d),
        |qp AS (
        |  SELECT id, term, count(*)::BIGINT AS tf, min(dl) AS dl FROM post
        |  WHERE term IN ('spark', 'query', 'fast') GROUP BY id, term),
        |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY term),
        |sc AS (
        |  SELECT id,
        |    sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))) AS s,
        |    count(*)::BIGINT AS n_matched
        |  FROM qp JOIN dfreq USING (term) CROSS JOIN st GROUP BY id)
        |SELECT id, round(s, 6) AS score, n_matched FROM sc
        |ORDER BY score DESC, id LIMIT 10""".stripMargin,

    // Retrieval metrics re-derivation: the txt_bm25_topk CTEs produce the
    // run, list_has_all produces the qrels, then exact divisions, decimal
    // log2 gains, and the BIGINT micro-nDCG fixed-point division.
    "txt_retrieval_metrics" -> PinnedOracles.sql("txt_retrieval_metrics"),

    // Fixture-twin re-derivation from the same inline VALUES.
    "txt_retrieval_metrics_fx" -> PinnedOracles.sql("txt_retrieval_metrics_fx"),

    // Spearman re-derivation: bm25 CTEs for the run, length ranking over
    // the same 10 docs, dense re-ranks inside the intersection, exact
    // integer sums, one trailing multiply+division.
    "txt_rank_correlation" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |st AS (SELECT count(t)::BIGINT AS n_docs, avg(len(t)) AS avgdl FROM d),
        |post AS (SELECT id, len(t) AS dl, unnest(t) AS term FROM d),
        |qp AS (
        |  SELECT id, term, count(*)::BIGINT AS tf, min(dl) AS dl FROM post
        |  WHERE term IN ('spark', 'query', 'fast') GROUP BY id, term),
        |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY term),
        |sc AS (
        |  SELECT id,
        |    sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))) AS s,
        |    count(*)::BIGINT AS n_matched
        |  FROM qp JOIN dfreq USING (term) CROSS JOIN st GROUP BY id),
        |run AS (
        |  SELECT id, round(s, 6) AS score FROM sc
        |  ORDER BY score DESC, id LIMIT 10),
        |ranked AS (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id)::BIGINT AS ra
        |  FROM run),
        |bylen AS (
        |  SELECT ranked.id,
        |    row_number() OVER (ORDER BY doc.n_chars DESC, ranked.id)::BIGINT AS rb
        |  FROM ranked JOIN documents doc ON doc.doc_id = ranked.id),
        |j AS (
        |  SELECT row_number() OVER (ORDER BY ra, id)::BIGINT AS ra2,
        |    row_number() OVER (ORDER BY rb, id)::BIGINT AS rb2
        |  FROM (SELECT ranked.id, ra, rb FROM ranked JOIN bylen USING (id))),
        |ag AS (
        |  SELECT count(*)::BIGINT AS n,
        |    coalesce(sum((ra2 - rb2) * (ra2 - rb2)), 0)::BIGINT AS sum_d2
        |  FROM j)
        |SELECT n, sum_d2,
        |  CASE WHEN n >= 2 THEN '1.0'::DOUBLE - ('6.0'::DOUBLE * sum_d2::DOUBLE)
        |    / (n * (n * n - 1))::DOUBLE END AS rho
        |FROM ag""".stripMargin,

    // Expected table pinned from the hand-checkable 6-row fixture.
    "tdp_build_corpus" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id AS id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT id, text, toks, len(toks) AS n_tokens,
        |    list_reduce(list_prepend(0, list_transform(toks, t -> len(t))), (a,b) -> a+b)::DOUBLE
        |      / len(toks) AS mean_token_len,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that')))::DOUBLE
        |      / len(toks) AS stopword_ratio,
        |    (len(text) - len(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE
        |      / len(text) AS punct_ratio,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','una'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('的','是','了','在','和','有'))) AS h_zh
        |  FROM tk),
        |scored AS (
        |  SELECT id, text, toks,
        |    (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * 0.4::DOUBLE
        |      + (CASE WHEN stopword_ratio > 0.02 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        |      + (CASE WHEN punct_ratio < 0.2 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality_score,
        |    CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) <= 0 THEN 'und'
        |         WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
        |         WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
        |         WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
        |         WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
        |         ELSE 'zh' END AS predicted_lang
        |  FROM m),
        |qual AS (SELECT * FROM scored WHERE quality_score >= 0.5),
        |surv AS (SELECT min(id) AS id FROM qual GROUP BY md5(text)),
        |exdocs AS (SELECT q.* FROM qual q JOIN surv e ON q.id = e.id),
        |sh AS (
        |  SELECT DISTINCT id,
        |    unnest(list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM exdocs),
        |hs AS (SELECT id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
        |mh AS (
        |  SELECT id, i, min((a * h + b) % 2147483647) AS mhv
        |  FROM hs CROSS JOIN (SELECT * FROM (VALUES MINHASH_COEFFS) AS t(i, a, b)) co
        |  GROUP BY id, i),
        |sig AS (SELECT id, list(mhv ORDER BY i) AS s FROM mh GROUP BY id),
        |bands AS (
        |  SELECT id, b,
        |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
        |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
        |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
        |cand AS (
        |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
        |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh AND l.id < r.id),
        |est AS (
        |  SELECT id_a, id_b, sum(CASE WHEN ma.mhv = mb.mhv THEN 1 ELSE 0 END) / 16.0 AS ej
        |  FROM cand
        |  JOIN mh ma ON ma.id = id_a
        |  JOIN mh mb ON mb.id = id_b AND mb.i = ma.i
        |  GROUP BY id_a, id_b),
        |pairs AS (SELECT id_a, id_b FROM est WHERE ej >= 0.6),
        |edges AS (
        |  SELECT id_a AS s, id_b AS d FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, rr.r FROM edges e JOIN reach rr ON e.d = rr.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |losers AS (SELECT id FROM comp WHERE id <> component)
        |SELECT id, text, predicted_lang, quality_score
        |FROM exdocs WHERE id NOT IN (SELECT id FROM losers)
        |ORDER BY id""".stripMargin.replace("MINHASH_COEFFS", minhashCoeffs),

  )

  /** The artifact-round-trip twins (round-13) score from parquet-
    * reloaded weights/counts, which are exact by construction — each
    * shares its source query's live oracle verbatim. */
  val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "txt_lr_reload" -> oracleSqlBase("txt_lr_train"),
    "txt_lm_reload" -> oracleSqlBase("txt_lm_score"),
    // compose the two live re-derivations exactly as the engine composes
    // the two reloaded artifacts (DuckDB allows WITH inside subqueries)
    "pipeline_artifact_serve" ->
      s"""SELECT s.doc_id, (dup.doc_id IS NOT NULL) AS is_dup_partner,
         |  s.n_tokens, s.lm_score
         |FROM (${lmScoreSql("(SELECT doc_id AS id, text FROM documents)", 20, 400)}) s
         |LEFT JOIN (
         |  SELECT DISTINCT id_b AS doc_id FROM (${QueriesDedupSim.TfidfNearDupSql})
         |) dup ON dup.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin)

  val rederiveSql: Map[String, String] = Map(
    "txt_ensemble_calibration" -> ensembleCalibrationSql,

    // Live Viterbi re-derivation of the pinned unigram encode: the
    // (piece, cost) table is interpolated from the SAME fixture-trained
    // model the engine broadcasts (minhashCoeffs can't-desync rule), the
    // recursive CTE enumerates EVERY segmentation of each distinct word
    // (31 words, len <= 8, pieces <= 4 chars -> <= ~110 paths/word), and
    // the winner is picked under the engine's exact total order: min
    // quantized cost, then fewer tokens, then binary-smallest joined
    // string (ASCII corpus, so DuckDB binary == Java UTF-16 order). The
    // single-char <unk> passthrough costs max(vocab)+1e6, as in
    // [[graft.operators.Unigram.viterbiEncodeWord]]. DP-with-local-ties
    // (engine) equals global enumeration min because cost and n_tokens
    // are additive and equal-coverage prefixes can never be string-
    // prefixes of each other (equal char count + equal space count).
    "txt_unigram_encode" -> UnigramViterbiRederiveSql,

    // the reload twin re-derives against the SAME live Viterbi SQL: a
    // lossy save/load would desync the segmentation and redden this row
    "txt_unigram_reload" -> UnigramViterbiRederiveSql,
  ) ++ rederiveSqlRest

  /** Live Viterbi re-derivation shared by txt_unigram_encode and
    * txt_unigram_reload (see the rederiveSql comment above). */
  private lazy val UnigramViterbiRederiveSql: String = {
      val pieceRows = unigramFixtureModel.costs.toSeq.sorted
        .map { case (p, c) => s"('${p.replace("'", "''")}', ${c}::BIGINT)" }
        .mkString(", ")
      s"""WITH RECURSIVE pieces(piece, cost) AS (
         |  SELECT * FROM (VALUES $pieceRows) AS t(p, c)),
         |d AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |  FROM documents WHERE doc_id < 200),
         |words AS (SELECT DISTINCT unnest(t) AS word FROM d),
         |cand AS (
         |  SELECT w.word, g.i AS pos, p.piece, p.cost
         |  FROM words w, LATERAL unnest(generate_series(1, len(w.word))) AS g(i)
         |  JOIN pieces p ON substr(w.word, CAST(g.i AS INT), len(p.piece)) = p.piece
         |  UNION ALL
         |  SELECT w.word, g.i, substr(w.word, CAST(g.i AS INT), 1),
         |    (SELECT max(cost) + 1000000 FROM pieces)
         |  FROM words w, LATERAL unnest(generate_series(1, len(w.word))) AS g(i)
         |  WHERE NOT EXISTS (SELECT 1 FROM pieces p
         |                    WHERE p.piece = substr(w.word, CAST(g.i AS INT), 1))),
         |seg(word, pos, toks, ntok, cost) AS (
         |  SELECT word, 1::BIGINT, ''::VARCHAR, 0::BIGINT, 0::BIGINT FROM words
         |  UNION ALL
         |  SELECT s.word, s.pos + len(c.piece),
         |    CASE WHEN s.toks = '' THEN c.piece
         |         ELSE s.toks || ' ' || c.piece END,
         |    s.ntok + 1, s.cost + c.cost
         |  FROM seg s JOIN cand c ON c.word = s.word AND c.pos = s.pos
         |  WHERE s.pos <= len(s.word)),
         |best AS (
         |  SELECT word, toks, ntok FROM (
         |    SELECT word, toks, ntok,
         |      row_number() OVER (PARTITION BY word
         |        ORDER BY cost, ntok, toks) AS rn
         |    FROM seg WHERE pos = len(word) + 1) WHERE rn = 1),
         |docw AS (
         |  SELECT doc_id, i, t[i] AS word
         |  FROM d, LATERAL unnest(generate_series(1, len(t))) AS g(i)),
         |agg AS (
         |  SELECT doc_id, sum(b.ntok)::BIGINT AS n_tokens,
         |    string_agg(b.toks, ' ' ORDER BY i) AS tokens_str
         |  FROM docw JOIN best b USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
         |  coalesce(a.tokens_str, '') AS tokens_str
         |FROM d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin
  }

  // lazy: referenced by rederiveSql above, which initializes first
  private lazy val rederiveSqlRest: Map[String, String] = Map(
    "txt_boilerplate_fx" -> boilerplateScrubSql(
      """(SELECT c0::BIGINT AS id, c1::VARCHAR AS text FROM (VALUES
        |  (1, 'COOKIE BANNER' || chr(10) || 'alpha beta' || chr(10) || 'footer'),
        |  (2, 'COOKIE BANNER' || chr(10) || 'gamma delta' || chr(10) || 'footer'),
        |  (3, 'COOKIE BANNER' || chr(10) || 'epsilon zeta'),
        |  (4, 'COOKIE BANNER' || chr(10) || 'footer')) AS t(c0, c1))""".stripMargin,
      "chr(10)", 0.6),
    "tdp_psi_drift" ->
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
        |c AS (
        |  SELECT j.bucket, j.n_a, j.n_b,
        |    CAST(round(((j.n_a + 1)::DOUBLE / (t.t_a + 12) - (j.n_b + 1)::DOUBLE / (t.t_b + 12))
        |      * ln(((j.n_a + 1)::DOUBLE / (t.t_a + 12)) / ((j.n_b + 1)::DOUBLE / (t.t_b + 12)))
        |      * 1000000000.0::DOUBLE) AS BIGINT) AS contrib_n9
        |  FROM j CROSS JOIN t),
        |p AS (SELECT sum(contrib_n9)::BIGINT AS psi_n9 FROM c)
        |SELECT c.bucket::INT AS bucket, c.n_a, c.n_b, c.contrib_n9, p.psi_n9
        |FROM c CROSS JOIN p ORDER BY bucket""".stripMargin,

    "txt_vocab_drift" ->
      """WITH ca AS (
        |  SELECT term, count(*)::BIGINT AS c_a FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS term
        |    FROM documents WHERE doc_id % 2 = 0) GROUP BY term),
        |cb AS (
        |  SELECT term, count(*)::BIGINT AS c_b FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS term
        |    FROM documents WHERE doc_id % 2 = 1) GROUP BY term),
        |u AS (
        |  SELECT term, coalesce(c_a, 0) + coalesce(c_b, 0) AS c
        |  FROM ca FULL OUTER JOIN cb USING (term)),
        |v AS (SELECT term FROM u ORDER BY c DESC, term LIMIT 25),
        |j AS (
        |  SELECT v.term, coalesce(ca.c_a, 0)::BIGINT AS c_a,
        |    coalesce(cb.c_b, 0)::BIGINT AS c_b
        |  FROM v LEFT JOIN ca USING (term) LEFT JOIN cb USING (term)),
        |t AS (SELECT
        |  (SELECT coalesce(sum(c_a), 0)::BIGINT FROM ca) AS t_a,
        |  (SELECT coalesce(sum(c_b), 0)::BIGINT FROM cb) AS t_b,
        |  (SELECT coalesce(sum(c_a), 0)::BIGINT FROM j) AS v_a,
        |  (SELECT coalesce(sum(c_b), 0)::BIGINT FROM j) AS v_b),
        |w AS (
        |  SELECT term, c_a, c_b FROM j
        |  UNION ALL SELECT '<oov>', t_a - v_a, t_b - v_b FROM t),
        |pq AS (
        |  SELECT w.term, w.c_a, w.c_b,
        |    (w.c_a + 1)::DOUBLE / (t.t_a + 26) AS p,
        |    (w.c_b + 1)::DOUBLE / (t.t_b + 26) AS q
        |  FROM w CROSS JOIN t),
        |c2 AS (
        |  SELECT term, c_a, c_b,
        |    CAST(round(('0.5'::DOUBLE * (p * ln(p / ((p + q) / '2.0'::DOUBLE)))
        |        + '0.5'::DOUBLE * (q * ln(q / ((p + q) / '2.0'::DOUBLE))))
        |      * 1000000000.0::DOUBLE) AS BIGINT) AS contrib_n9
        |  FROM pq),
        |js AS (SELECT sum(contrib_n9)::BIGINT AS js_n9 FROM c2)
        |SELECT c2.term, c2.c_a, c2.c_b, c2.contrib_n9, js.js_n9
        |FROM c2 CROSS JOIN js ORDER BY term""".stripMargin,

    "txt_lm_score_fx" ->
      lmScoreSql(
        "(VALUES (1, 'a b a b c'), (2, 'a a a'), (3, 'c d a'), (4, '')) AS v(id, text)",
        3, 10),

    "txt_normalize_fx" ->
      """WITH d(id, text) AS (VALUES
        |  (1, 'Cafe' || chr(769) || ' au lait'),
        |  (2, 'Caf' || chr(233) || ' au lait'),
        |  (3, 'plain ascii'),
        |  (4, 'A' || chr(778) || ' ring'),
        |  (5, chr(8491) || ' angstrom sign'))
        |SELECT id::BIGINT AS id, nfc_normalize(text) AS norm,
        |  nfc_normalize(text) = text AS unchanged
        |FROM d ORDER BY id""".stripMargin,

    "txt_retrieval_metrics" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |st AS (SELECT count(t)::BIGINT AS n_docs, avg(len(t)) AS avgdl FROM d),
        |post AS (SELECT id, len(t) AS dl, unnest(t) AS term FROM d),
        |qp AS (
        |  SELECT id, term, count(*)::BIGINT AS tf, min(dl) AS dl FROM post
        |  WHERE term IN ('spark', 'query', 'fast') GROUP BY id, term),
        |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY term),
        |sc AS (
        |  SELECT id,
        |    sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))) AS s,
        |    count(*)::BIGINT AS n_matched
        |  FROM qp JOIN dfreq USING (term) CROSS JOIN st GROUP BY id),
        |run AS (
        |  SELECT id AS doc_id, round(s, 6) AS score FROM sc
        |  ORDER BY score DESC, doc_id LIMIT 10),
        |ranked AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
        |  FROM run),
        |qrels AS (SELECT id AS doc_id FROM d
        |  WHERE list_has_all(t, ['spark', 'query', 'fast'])),
        |nrel AS (SELECT count(*)::BIGINT AS n_rel FROM qrels),
        |hits AS (
        |  SELECT rank FROM ranked
        |  WHERE rank <= 10 AND doc_id IN (SELECT doc_id FROM qrels)),
        |hag AS (
        |  SELECT count(*)::BIGINT AS hits_k, min(rank) AS first_rank,
        |    sum(CAST(round('1000000000.0'::DOUBLE / log2(rank + '1.0'::DOUBLE)) AS BIGINT))
        |      ::BIGINT AS dcg_n9
        |  FROM hits),
        |ig AS (
        |  SELECT sum(CAST(round('1000000000.0'::DOUBLE / log2(r + '1.0'::DOUBLE)) AS BIGINT))
        |      ::BIGINT AS idcg_n9
        |  FROM (SELECT unnest(range(1, least(10, (SELECT n_rel FROM nrel)) + 1)) AS r))
        |SELECT 1::BIGINT AS query_id, nrel.n_rel,
        |  coalesce(hag.hits_k, 0)::BIGINT AS hits_k,
        |  CASE WHEN hag.first_rank IS NOT NULL
        |       THEN '1.0'::DOUBLE / hag.first_rank::DOUBLE ELSE '0.0'::DOUBLE END AS mrr,
        |  coalesce(hag.hits_k, 0)::DOUBLE / nrel.n_rel::DOUBLE AS recall_k,
        |  coalesce(hag.dcg_n9, 0)::BIGINT AS dcg_n9,
        |  ig.idcg_n9,
        |  (coalesce(hag.dcg_n9, 0) * 1000000) // ig.idcg_n9 AS ndcg_fp
        |FROM nrel CROSS JOIN hag CROSS JOIN ig""".stripMargin,

    "txt_retrieval_metrics_fx" ->
      """WITH runs(query_id, doc_id, rank) AS (VALUES
        |  (1, 10, 1), (1, 11, 2), (1, 12, 3),
        |  (3, 30, 1), (3, 31, 2),
        |  (4, 40, 1)),
        |qrels(query_id, doc_id) AS (VALUES
        |  (1, 11), (1, 99),
        |  (2, 20),
        |  (3, 30), (3, 31), (3, 32), (3, 33)),
        |nrel AS (
        |  SELECT query_id::BIGINT AS query_id, count(*)::BIGINT AS n_rel
        |  FROM qrels GROUP BY query_id),
        |hits AS (
        |  SELECT r.query_id::BIGINT AS query_id, r.rank::BIGINT AS rank
        |  FROM runs r JOIN qrels q
        |    ON q.query_id = r.query_id AND q.doc_id = r.doc_id
        |  WHERE r.rank <= 3),
        |hag AS (
        |  SELECT query_id, count(*)::BIGINT AS hits_k, min(rank) AS first_rank,
        |    sum(CAST(round('1000000000.0'::DOUBLE / log2(rank + '1.0'::DOUBLE)) AS BIGINT))
        |      ::BIGINT AS dcg_n9
        |  FROM hits GROUP BY query_id),
        |ig AS (
        |  SELECT query_id, n_rel,
        |    sum(CAST(round('1000000000.0'::DOUBLE / log2(r + '1.0'::DOUBLE)) AS BIGINT))
        |      ::BIGINT AS idcg_n9
        |  FROM nrel, LATERAL unnest(range(1, least(3, n_rel) + 1)) AS u(r)
        |  GROUP BY query_id, n_rel)
        |SELECT ig.query_id, ig.n_rel,
        |  coalesce(hag.hits_k, 0)::BIGINT AS hits_k,
        |  CASE WHEN hag.first_rank IS NOT NULL
        |       THEN '1.0'::DOUBLE / hag.first_rank::DOUBLE ELSE '0.0'::DOUBLE END AS mrr,
        |  coalesce(hag.hits_k, 0)::DOUBLE / ig.n_rel::DOUBLE AS recall_k,
        |  coalesce(hag.dcg_n9, 0)::BIGINT AS dcg_n9,
        |  ig.idcg_n9,
        |  (coalesce(hag.dcg_n9, 0) * 1000000) // ig.idcg_n9 AS ndcg_fp
        |FROM ig LEFT JOIN hag ON hag.query_id = ig.query_id
        |ORDER BY ig.query_id""".stripMargin,
  )

}
