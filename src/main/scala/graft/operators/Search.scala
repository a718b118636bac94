package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text keyword retrieval over a document corpus: BM25 top-k scoring
  * (Robertson/Sparck-Jones probabilistic ranking, the standard lexical
  * complement to embedding ANN in a training-data pipeline — e.g. targeted
  * corpus probes, contamination hunts, eval-set retrieval baselines).
  *
  * Scale-first shape:
  *  - the corpus token stream is filtered to the query's terms BEFORE any
  *    shuffle (the term list is a literal `isin` predicate pushed inside
  *    the exploded projection), so the per-(doc, term) aggregation
  *    shuffles only matching postings, not the whole corpus;
  *  - corpus-level statistics (N, avgdl) are one tiny aggregate joined
  *    back by broadcast cross-join (one row);
  *  - per-term document frequencies are a second tiny aggregate over the
  *    postings (bounded by |query terms|), joined by broadcast;
  *  - the final top-k is a TakeOrdered (sort + limit), never a full sort.
  */
object Search {

  /** Lowercased whitespace term stream — the indexing unit. */
  def terms(text: Column): Column = tokens(lower(text))

  /** Corpus vocabulary: the `topK` most frequent terms with counts — the
    * tokenizer-training / stopword-mining primitive. One map-side-combined
    * aggregation plus a TakeOrdered cut; ties break lexicographically. */
  def vocabulary(docs: DataFrame, text: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"vocabulary: topK must be >= 1, got $topK")
    docs.select(explode(terms(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)
  }

  /** BM25 scores for one bag-of-terms query; returns the top `k` documents
    * as `(id, score, n_matched)` ordered by score desc (doc id asc on
    * ties — fully deterministic cut).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative Lucene
    * variant); tf component = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    * `dl` counts ALL terms of the document, not just query terms. Scores
    * are rounded to 6 dp to stay engine-portable (ln/division ULP). */
  def bm25TopK(
      docs: DataFrame,
      id: Column,
      text: Column,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    require(k >= 1, s"bm25TopK: k must be >= 1, got $k")
    val qTerms = query.map(_.toLowerCase).distinct.filter(_.nonEmpty)
    require(qTerms.nonEmpty, "bm25TopK: query must contain at least one non-empty term")

    val base = docs.select(id.as("id"), terms(text).as("_t"))
    // Corpus stats: one row (N, avgdl) — broadcast cross join. N counts
    // TOKENIZABLE docs (count of non-null token arrays), consistent with
    // avgdl's null-skipping average: a null-text doc can never match a
    // term, so letting it inflate N would overstate every idf relative
    // to the retrievable corpus.
    val stats = base.agg(
      count(col("_t")).as("n_docs"),
      avg(size(col("_t"))).as("avgdl"))
    // Postings for query terms only: the isin predicate runs inside the
    // projection, so non-matching tokens never leave the scan stage.
    // LAZY localCheckpoint: the aggregated postings (tiny — docs matching
    // the query only) are read twice (score join + document frequencies);
    // without the pin the full corpus scan + explode would re-execute for
    // the df branch (same contract as Dedup.minHashLshPairs).
    val postings = base
      .select(col("id"), size(col("_t")).as("dl"), explode(col("_t")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .transform(graft.operators.Pin.lazyPin)
    // Per-term document frequency: bounded by |qTerms| rows — broadcast.
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfPart = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

    postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_s", idf * tfPart)
      .groupBy(col("id"))
      .agg(round(sum(col("_s")), 6).as("score"), count(lit(1)).as("n_matched"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion of two rankings — the hybrid-retrieval
    * combiner (lexical BM25 + embedding ANN is the canonical pair;
    * Cormack et al. 2009):
    *
    *   rrf(d) = 1/(k + rank_a(d)) + 1/(k + rank_b(d))
    *
    * with a missing ranking contributing 0. Rank-based, so the two score
    * scales never need calibration. Both inputs must carry one row per
    * id with a 1-based `rank` column (ties pre-broken upstream — both
    * this engine's rankers break on id). Exact arithmetic: two exactly-
    * rounded divisions and one add in a fixed order, bit-identical
    * cross-engine. Output ordered (rrf desc, id), cut at `topK`.
    *
    * Scale shape: a full-outer equi-join of two ALREADY-CUT rankings
    * (both bounded by their own top-k — broadcast-sized by construction)
    * and a bounded TakeOrdered. Per-query fusion at scale is the same
    * join keyed by (query_id, id): pass rankings carrying a composite id.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      id: String,
      rank: String = "rank",
      k: Int = 60,
      topK: Int = 10,
  ): DataFrame = {
    require(k >= 1, s"rrfFuse: k must be >= 1, got $k")
    require(topK >= 1, s"rrfFuse: topK must be >= 1, got $topK")
    val left = a.select(col(id).as("id"), col(rank).as("_ra"))
    val right = b.select(col(id).as("id"), col(rank).as("_rb"))
    left.join(right, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(k) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("_rb")), lit(0.0))).as("rrf"),
        col("_ra").as("rank_a"), col("_rb").as("rank_b"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
  }

  /** Per-document out-of-vocabulary rate under a vocabulary table — the
    * tokenizer-coverage check run before committing to a trained vocab:
    * (id, n_tokens, n_oov, oov_rate) with NULL rate for empty/null docs
    * (which keep their row). One exact division.
    *
    * Scale shape: the vocab is explicitly broadcast (it is top-K bounded
    * by construction), tokens explode in a Generate projection, and the
    * only exchange is the per-doc count aggregation — the corpus itself
    * never shuffles by content.
    */
  def oovRate(docs: DataFrame, id: Column, text: Column, vocab: DataFrame): DataFrame = {
    val v = broadcast(vocab.select(col("term")).filter(col("term").isNotNull)
      .distinct().withColumn("_in_vocab", lit(1)))
    docs.select(id.as("id"), terms(text).as("_t"))
      .select(col("id"), explode_outer(col("_t")).as("term"))
      .join(v, Seq("term"), "left")
      .groupBy(col("id"))
      .agg(
        count(col("term")).as("n_tokens"),
        sum(when(col("term").isNotNull && col("_in_vocab").isNull, lit(1L))
          .otherwise(lit(0L))).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double")))
  }

  /** Top TF-IDF terms per group — the per-source keyword/topic profile
    * (what distinguishes THIS slice of the corpus), the lightweight
    * domain-tagging signal mixture planning reads before weighting
    * sources.
    *
    *   idf = round(ln((1 + N) / (1 + df)), 6),  score = tf · idf
    *
    * with N = number of groups and df = groups containing the term (the
    * smoothed document-frequency form). Engine parity: tf/df/N are exact
    * BIGINTs; the ln rides the PROVEN 6-dp round contract
    * (txt_pmi_bigrams precedent, driver-green since r5); score is one
    * IEEE multiply of an exact-int double by that 6-dp value.
    *
    * Scale shape: one (group, term) aggregation of the corpus, a
    * |terms|-bounded df re-aggregation, a one-row N frame cross-joined
    * broadcast, and the top-k cut as a row_number window over the
    * (group, term) TABLE — vocabulary-bounded, never the corpus.
    *
    * @return (group, rank, term, tf, idf, score) ordered by
    *         (group, rank) */
  def tfidfTerms(docs: DataFrame, group: Column, text: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"tfidfTerms: topK must be >= 1, got $topK")
    val tf = docs.select(group.as("group"), explode(terms(text)).as("term"))
      .groupBy(col("group"), col("term")).agg(count(lit(1)).as("tf"))
      .transform(graft.operators.Pin.lazyPin)
    val ng = tf.select(col("group")).distinct().agg(count(lit(1)).as("_n"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(ng))
      .withColumn("idf",
        round(log((lit(1.0) + col("_n")) / (lit(1.0) + col("_df"))), 6))
      .withColumn("score", col("tf").cast("double") * col("idf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("group"), col("rank"), col("term"), col("tf"), col("idf"), col("score"))
      .orderBy(col("group"), col("rank"))
  }

  /** Per-group distinct-n diversity (Li et al. 2016's distinct-n, at
    * corpus scope): distinct n-grams over TOTAL n-gram windows for each
    * group — the repetitiveness/mode-collapse readout run over generated
    * corpora (and the per-source template-density probe on scraped ones).
    * Unlike [[graft.functions.TextFunctions.repetitionScore]] (within one
    * document), this measures diversity ACROSS a group's documents.
    *
    * Engine parity: both counters are exact BIGINTs from one (group,
    * gram) aggregation; the ratio is one exactly-rounded IEEE division.
    *
    * Scale shape: explode + two-level hash aggregation sharing the group
    * key prefix, map-side combined; no join, no window. Groups whose
    * documents are all shorter than `n` emit no row (no windows exist).
    *
    * @return (group, n_grams, n_distinct, distinct_ratio) ordered by
    *         group */
  def distinctNgrams(docs: DataFrame, group: Column, text: Column, n: Int = 2): DataFrame = {
    require(n >= 1, s"distinctNgrams: n must be >= 1, got $n")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    // native window generator (r14): the transform/slice/concat_ws HOF
    // form paid interpreted per-window dispatch on every bigram of the
    // corpus — one codegen pass per doc instead; empty for short docs
    // exactly like the old when(size >= n) branch (NULL tokens explode
    // to nothing either way)
    val grams = graft.functions.WordGramsExpr.gramsCol(terms(text), n)
    docs.select(group.as("group"), explode(grams).as("gram"))
      .groupBy(col("group"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("group"))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_grams").cast("double"))
      .orderBy(col("group"))
  }

  /** Per-document n-gram novelty — the memorization/duplication exposure
    * metric: what fraction of a document's distinct word n-gram shingles
    * appear in NO other document of the corpus. Low novelty marks
    * template/boilerplate documents (their content lives elsewhere too);
    * high novelty marks unique text worth keeping through dedup.
    *
    * Engine parity: counts are exact BIGINTs over the shared shingle
    * contract ([[graft.functions.TextFunctions.wordShingles]] — distinct,
    * short docs collapse to one whole-text shingle); `novelty` is one
    * exactly-rounded IEEE division.
    *
    * Scale shape: the inverted-index pattern without the pair join — ONE
    * (doc, shingle) explode (shingles are pre-distinct per doc, so
    * document frequency is a plain count), ONE shingle-keyed df
    * aggregation, and a df join back on the SAME shingle key before the
    * per-doc rollup. The corpus never self-joins; state per shingle is
    * one counter, so no df cap is needed (unlike the pair-generating
    * Jaccard index, a hot shingle costs a bigger count, not a quadratic
    * candidate set).
    *
    * @return (id, n_grams, n_novel, novelty) ordered by id */
  def ngramNovelty(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame = {
    require(n >= 1, s"ngramNovelty: n must be >= 1, got $n")
    val sh = docs
      .select(id.as("id"), explode(wordShingles(text, n)).as("shingle"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    sh.join(df, Seq("shingle"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_df") === 1L, lit(1L)).otherwise(lit(0L))).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .orderBy(col("id"))
  }

  /** Spearman rank correlation between two rankings — the retriever
    * diagnostic behind questions like "is this ranking just document
    * length?" or "how far apart are the lexical and embedding runs?":
    *
    *   rho = 1 - 6 Σ d² / (n (n² - 1)),  d = rank_a - rank_b
    *
    * computed over the ID INTERSECTION of the two rankings, each side
    * re-ranked densely within the intersection by its original rank
    * (the standard treatment for comparing top-k lists). Σd² and
    * n(n²-1) are exact integers; rho is one multiply and one division —
    * exactly-rounded IEEE, bit-identical cross-engine with no rounding
    * discipline. rho is NULL when n < 2 (undefined). Ties in the input
    * rank column break on id, deterministically.
    *
    * Scale shape: an equi-join of two ALREADY-CUT rankings (both
    * top-k-bounded by construction — the global re-rank windows run
    * over at most min(k_a, k_b) rows, never a corpus).
    *
    * @return one row: (n, sum_d2, rho) */
  def rankCorrelation(a: DataFrame, b: DataFrame, id: String,
      rank: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = a.select(col(id).as("id"), col(rank).cast("long").as("_ra"))
    val r = b.select(col(id).as("id"), col(rank).cast("long").as("_rb"))
    val joined = l.join(r, Seq("id"))
      .withColumn("ra",
        row_number().over(Window.orderBy(col("_ra").asc, col("id").asc)).cast("long"))
      .withColumn("rb",
        row_number().over(Window.orderBy(col("_rb").asc, col("id").asc)).cast("long"))
    val d2 = (col("ra") - col("rb")) * (col("ra") - col("rb"))
    joined
      .agg(count(lit(1)).as("n"), coalesce(sum(d2), lit(0L)).as("sum_d2"))
      .withColumn("rho",
        when(col("n") >= 2,
          lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (col("n") * (col("n") * col("n") - lit(1L))).cast("double")))
  }

  /** Ranked-retrieval evaluation — MRR, recall@k, and nDCG@k per query:
    * the metrics harness run over any of this engine's rankers (BM25,
    * ANN top-k, RRF fusion) against a relevance-judgment table, the
    * standard gate before trusting a retriever to mine training data.
    *
    * Binary relevance; a run row is a hit when (query_id, doc_id) appears
    * in qrels. Within the top k:
    *
    *   mrr      = 1 / rank of the first hit          (0 when no hit)
    *   recall_k = hits_k / n_rel
    *   dcg_n9   = Σ_hits  round(10⁹/log2(rank+1))    (long-summed nanos)
    *   idcg_n9  = Σ_{r=1..min(k, n_rel)} round(10⁹/log2(r+1))
    *   ndcg_fp  = (dcg_n9 · 10⁶) div idcg_n9          (micro-nDCG BIGINT)
    *
    * Parity discipline: mrr/recall are single exactly-rounded divisions
    * of exact integers; the log2 gains are rounded to integer NANO units
    * and long-summed; and the nDCG ratio ships as an exact BIGINT
    * fixed-point (micro units, truncating integer div) — never as a
    * recomputed double or a DECIMAL column (the r6→r9 oracle lesson:
    * DECIMAL output columns are rendered differently across runtimes
    * even at identical values). Queries present in qrels but absent from
    * the run still report (hits_k=0, mrr=0, recall=0) — a silent
    * retriever miss must not vanish from the report.
    *
    * Scale shape: runs⋈qrels is an equi-join on (query_id, doc_id);
    * per-query metrics are one hash aggregation; idcg explodes a
    * bounded 1..min(k,n_rel) sequence per query (≤ k rows each). The
    * corpus itself is never touched — both inputs are already-cut
    * rankings and judgment lists.
    *
    * @param runs  (query_id, doc_id, rank) — 1-based, ties pre-broken;
    *              duplicate (query_id, doc_id) rows are collapsed to
    *              their best (min) rank before scoring
    * @param qrels (query_id, doc_id) binary relevance judgments
    * @return one row per judged query: (query_id, n_rel, hits_k, mrr,
    *         recall_k, dcg_n9, idcg_n9, ndcg_fp), ordered by query_id */
  /** ROUGE-N between candidate/reference text pairs — the n-gram-overlap
    * generation-eval metric (Lin 2004): per pair, clipped n-gram overlap
    *
    *   overlap = Sum_g min(count_cand(g), count_ref(g))
    *   recall = overlap / |ref grams|, precision = overlap / |cand grams|,
    *   f1 = 2pr / (p + r)
    *
    * Engine parity: counts are exact BIGINTs; precision/recall are one
    * IEEE division each and f1 one fixed-association expression over
    * them — no rounding discipline needed. Pairs where either side has no
    * n-grams (text shorter than n) keep their row with NULL metrics: an
    * undefined ratio reported as 0 would read as "candidate scored worst"
    * in downstream aggregation.
    *
    * Scale shape: candidate and reference live on the SAME row, so both
    * explode from one scan with a side tag; ONE (pair, gram) aggregation
    * with map-side partials computes the clipped overlap; one per-pair
    * rollup finishes. No join at any point.
    *
    * @param pairs (pair_id, candidate, reference)
    * @return (pair_id, n_cand, n_ref, overlap, precision, recall, f1)
    *         ordered by pair_id */
  def rougeN(
      pairs: DataFrame,
      pairId: Column,
      candidate: Column,
      reference: Column,
      n: Int = 2,
  ): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    graft.functions.GraftFunctions.ensureRegistered(pairs.sparkSession)
    // Candidate and reference share a ROW, so the clipped-overlap counts
    // need NO exchange at all: the previous shape exploded every gram
    // instance of both sides into (pair, side, gram) rows, shuffled them
    // through two aggregations, and joined the rollup back to the pair
    // spine — structurally wrong at 100 TB (a per-row metric paying two
    // corpus-wide shuffles) and 2 Exchanges + 1 join slower here. The
    // native kernel ([[graft.functions.GramOverlapExpr]]) computes
    // (cand_total, ref_total, clip) in one codegen pass per pair; NULL
    // token arrays yield a NULL struct, coalesced to the zeros the old
    // left join produced.
    val p = when(col("n_cand") > 0L,
      col("overlap").cast("double") / col("n_cand").cast("double"))
    val r = when(col("n_ref") > 0L,
      col("overlap").cast("double") / col("n_ref").cast("double"))
    pairs
      .select(pairId.as("pair_id"),
        terms(candidate).as("_ct"), terms(reference).as("_rt"))
      .select(col("pair_id"),
        graft.functions.GramOverlapExpr
          .overlapCol(col("_ct"), col("_rt"), n).as("_g"))
      .select(col("pair_id"),
        coalesce(col("_g.cand_total"), lit(0L)).as("n_cand"),
        coalesce(col("_g.ref_total"), lit(0L)).as("n_ref"),
        coalesce(col("_g.clip"), lit(0L)).as("overlap"))
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1",
        when(p.isNotNull && r.isNotNull && (p + r) > 0.0,
          lit(2.0) * p * r / (p + r)).otherwise(
          when(p.isNotNull && r.isNotNull, lit(0.0))))
      .orderBy(col("pair_id"))
  }

  def retrievalMetrics(runs: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"retrievalMetrics: k must be >= 1, got $k")
    val rel = qrels
      .select(col("query_id"), col("doc_id"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull)
      .distinct()
      .transform(graft.operators.Pin.lazyPin) // judged pairs + per-query totals both read it
    val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val gain = round(lit(1e9) / log2(col("rank") + lit(1.0))).cast("long")
    val hits = runs
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k)
      // dedupe the run on (query_id, doc_id) keeping the best (min) rank:
      // a doc listed at two ranks within top-k must not double-count
      // hits_k/dcg (which would let recall_k exceed 1)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("rank")).as("rank"))
      .join(rel, Seq("query_id", "doc_id"), "left_semi")
    val perQuery = hits
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("hits_k"),
        min(col("rank")).as("_first_rank"),
        sum(gain).as("dcg_n9"))
    val idcg = nRel
      .select(col("query_id"), col("n_rel"),
        explode(sequence(lit(1L), least(lit(k.toLong), col("n_rel")))).as("rank"))
      .groupBy(col("query_id"), col("n_rel"))
      .agg(sum(gain).as("idcg_n9"))
    idcg
      .join(perQuery, Seq("query_id"), "left")
      .withColumn("dcg_n9", coalesce(col("dcg_n9"), lit(0L)))
      .withColumn("hits_k", coalesce(col("hits_k"), lit(0L)))
      .select(
        col("query_id"),
        col("n_rel"),
        col("hits_k"),
        when(col("_first_rank").isNotNull,
          lit(1.0) / col("_first_rank").cast("double")).otherwise(lit(0.0)).as("mrr"),
        (col("hits_k").cast("double") / col("n_rel").cast("double")).as("recall_k"),
        col("dcg_n9"),
        col("idcg_n9"),
        // exact fixed-point ratio in micro-nDCG: both sums are already
        // BIGINT nanos, so dcg_n9·10⁶ div idcg_n9 is pure integer
        // arithmetic (dcg_n9 ≤ k·10⁹, so ·10⁶ stays far under int64)
        expr("(dcg_n9 * 1000000L) div idcg_n9").as("ndcg_fp"))
      .orderBy(col("query_id"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; each word scores
    * `degree/freq` (degree = Σ length of every phrase containing an
    * occurrence, freq = occurrence count — co-occurring words in long
    * phrases score high); a phrase scores the sum of its words' scores.
    * Corpus-level top-`topK` distinct phrases.
    *
    * Determinism: degree/freq are exact BIGINTs, the word score is one
    * IEEE division, and the phrase score is the FIXED-ORDER fold of word
    * scores in phrase position order (`aggregate` over the pos-sorted
    * list — the [[bleuPairs]]/late-interaction association the oracle's
    * `list_reduce(list_prepend(0.0, array_agg(.. ORDER BY pos)))`
    * replays). Identical phrase text ⇒ identical fold ⇒ bit-identical
    * score, so the distinct-phrase rollup is stable. No transcendental.
    *
    * Scale shape: one posexplode, a per-DOC running-stopword-count
    * window (partitioned by doc — parallel, state bounded by doc
    * length), one phrase-length count, one word-stats aggregation with
    * map-side partials, one per-phrase fold, and a TakeOrdered top-k —
    * never a global sort of the corpus.
    *
    * @return (phrase, n_words, n_occurrences, score) top-K by
    *         (score desc, phrase asc) */
  def rakeKeywords(
      docs: DataFrame,
      id: Column,
      text: Column,
      stopwords: Seq[String],
      topK: Int = 30,
  ): DataFrame = {
    require(stopwords.nonEmpty, "rakeKeywords: empty stopword list extracts whole docs")
    require(topK >= 1, s"rakeKeywords: topK must be >= 1, got $topK")
    val toks = docs
      .select(id.as("id"), posexplode(terms(text)))
      .withColumnRenamed("col", "tok")
      .withColumn("_st", when(col("tok").isin(stopwords: _*), 1L).otherwise(0L))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val words = toks
      .withColumn("_pk", sum(col("_st")).over(wDoc))
      .filter(col("_st") === 0L)
      .select(col("id"), col("_pk"), col("pos"), col("tok"))
      .transform(graft.operators.Pin.lazyPin) // phrase lengths, word stats, and the fold all re-read it
    val plen = words.groupBy(col("id"), col("_pk"))
      .agg(count(lit(1)).as("_wlen"))
    val occ = words.join(plen, Seq("id", "_pk"))
    val wordScores = occ.groupBy(col("tok"))
      .agg(sum(col("_wlen")).as("_degree"), count(lit(1)).as("_freq"))
      .withColumn("_wsc", col("_degree").cast("double") / col("_freq").cast("double"))
      .select(col("tok"), col("_wsc"))
    val phrases = occ.join(wordScores, Seq("tok"))
      .groupBy(col("id"), col("_pk"))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("phrase"),
        count(lit(1)).as("n_words"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("_wsc")))),
            x => x.getField("_wsc")),
          lit(0.0), (acc, x) => acc + x).as("score"))
    phrases.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(topK)
  }

  /** BLEU-2 generation-eval metric (Papineni et al. 2002): per pair, the
    * clipped (modified) unigram/bigram precisions, their geometric mean,
    * and the brevity penalty `exp(min(0, 1 - r/c))` — the standard
    * corpus-free sentence-level score, unsmoothed (a zero clip count
    * zeroes the geometric mean, exactly the textbook definition).
    *
    * Determinism contract: p1/p2 are exact single-division rationals over
    * BIGINT counts; `bleu2` rides a transcendental (the brevity exp) and
    * therefore ships `round(.., 6)`-ed on both engines — the proven pmi/
    * bm25 6-dp discipline. Pairs whose candidate has no tokens (p1
    * undefined) or no bigrams (p2 undefined) keep NULL metrics rather
    * than a fake zero, the [[rougeN]] policy.
    *
    * Scale shape ([[rougeN]]'s): candidate and reference share a row, so
    * all four gram streams (two sizes x two sides) explode from ONE scan
    * with (n, side) tags; one (pair, n, gram) aggregation with map-side
    * partials computes the clipped overlaps; one per-pair conditional
    * rollup pivots the two sizes into columns. No join at any point
    * except the final broadcast-sized spine restore.
    *
    * @param pairs (pair_id, candidate, reference)
    * @return (pair_id, c_len, r_len, n1_clip, n2_cand, n2_clip, p1, p2,
    *         bleu2) ordered by pair_id */
  def bleuPairs(
      pairs: DataFrame,
      pairId: Column,
      candidate: Column,
      reference: Column,
  ): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(pairs.sparkSession)
    // Shuffle-free per-row shape (the rougeN rewrite, r14): unigram and
    // bigram clipped counts come from two calls of the native
    // [[graft.functions.GramOverlapExpr]] kernel over the shared token
    // arrays — the old tagged-gram explode shuffled every gram instance
    // of both sides twice and joined the rollup back, for a metric that
    // never needed to leave its row.
    val p1 = when(col("c_len") > 0L,
      col("n1_clip").cast("double") / col("c_len").cast("double"))
    val p2 = when(col("n2_cand") > 0L,
      col("n2_clip").cast("double") / col("n2_cand").cast("double"))
    pairs
      .select(pairId.as("pair_id"),
        terms(candidate).as("_ct"), terms(reference).as("_rt"))
      .select(col("pair_id"),
        size(col("_ct")).cast("long").as("c_len"),
        size(col("_rt")).cast("long").as("r_len"),
        graft.functions.GramOverlapExpr
          .overlapCol(col("_ct"), col("_rt"), 1).as("_g1"),
        graft.functions.GramOverlapExpr
          .overlapCol(col("_ct"), col("_rt"), 2).as("_g2"))
      .select(col("pair_id"), col("c_len"), col("r_len"),
        coalesce(col("_g1.clip"), lit(0L)).as("n1_clip"),
        coalesce(col("_g2.cand_total"), lit(0L)).as("n2_cand"),
        coalesce(col("_g2.clip"), lit(0L)).as("n2_clip"))
      .withColumn("p1", p1)
      .withColumn("p2", p2)
      .withColumn("bleu2",
        when(col("p1").isNotNull && col("p2").isNotNull,
          round(sqrt(col("p1") * col("p2")) *
            exp(least(lit(0.0),
              lit(1.0) - col("r_len").cast("double") / col("c_len").cast("double"))), 6)))
      .orderBy(col("pair_id"))
  }
}
