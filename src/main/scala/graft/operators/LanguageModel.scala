package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style perplexity
  * filter of a training-data pipeline: train a bigram model over a (clean)
  * corpus, score every candidate document by its mean per-token negative
  * log-probability, and gate/bucket documents on that score. Low score ==
  * in-domain fluent text; high score == noise, boilerplate, wrong language.
  *
  * Model: stupid backoff (Brants et al. 2007, "Large Language Models in
  * Machine Translation" — the web-scale choice precisely because its
  * training is two count aggregations, no normalization pass):
  *
  *   p(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})      if the bigram and
  *                                                        its context are in
  *                                                        the capped model
  *                    = backoff * p_uni(w_i)              otherwise
  *   p(w_1)           = p_uni(w_1)                        (no context)
  *   p_uni(w)         = (c(w) + k) / (N + k * (V + 1))    add-k smoothed,
  *                                                        OOV -> c = 0
  *
  * where N = total training tokens and V = full (uncapped) vocabulary
  * width — so OOV mass is real probability mass, and p_uni < 1 always.
  *
  * Scale shape (the reason this form survives 100 TB):
  *  - training is two map-side-combined count aggregations (unigrams,
  *    bigrams) — one shuffle each over the token/bigram stream;
  *  - the MODEL is capped: top-`vocabSize` unigrams and top-`maxBigrams`
  *    bigrams by count (ties broken lexicographically — a deterministic
  *    TakeOrdered cut, never a full sort). Dropped tails fall back to the
  *    backoff/OOV paths, which is exactly the semantics of a capped LM;
  *  - scoring never shuffles the corpus: tokenize + posexplode is a
  *    Generate projection, the three model lookups are BROADCAST joins
  *    (the model is bounded by construction), corpus stats ride a 1-row
  *    broadcast cross-join, and the only exchange is the final per-doc
  *    aggregation — `posexplode_outer` keeps empty/null documents in that
  *    same aggregation, so no second join against the doc spine is needed.
  *
  * Engine parity: per-token neg-log-probs are rounded to 6 dp and summed
  * as DECIMAL(28,6) (order-independent exact sum); all double arithmetic
  * is single-division/same-association on both engines, so the DuckDB
  * oracle replays bit-identically.
  */
object LanguageModel {

  /** A trained capped bigram model. `stats` is one row (n_tok, v) over the
    * UNCAPPED training stream; `unigrams` (term, c) and `bigrams`
    * (w1, w2, c) are the capped count tables. */
  final case class BigramLm(
      stats: DataFrame,
      unigrams: DataFrame,
      bigrams: DataFrame,
      k: Double)

  /** Persist a trained [[BigramLm]] as four parquet tables (stats,
    * unigrams, bigrams, meta-with-k) — the LM artifact (round-13): train
    * once on the corpus, ship the tables, every scoring job loads them.
    * Counts are BIGINTs and k a stored double, so the round trip is
    * exact and a reloaded model scores bit-identically. */
  def saveBigramLm(lm: BigramLm, dir: String): Unit = {
    // All four frames are BOUNDED by the model caps (1 stats row,
    // <= vocabSize unigrams, <= maxBigrams bigrams, 1 meta row) — one
    // output file each, instead of inheriting the session's shuffle
    // partitioning (32 near-empty task commits per write, r14 measured).
    lm.stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/lm_stats.parquet")
    lm.unigrams.coalesce(1).write.mode("overwrite").parquet(s"$dir/lm_unigrams.parquet")
    lm.bigrams.coalesce(1).write.mode("overwrite").parquet(s"$dir/lm_bigrams.parquet")
    lm.stats.sparkSession.range(1).select(lit(lm.k).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lm_meta.parquet")
  }

  /** Load a [[saveBigramLm]] artifact. */
  def loadBigramLm(spark: org.apache.spark.sql.SparkSession, dir: String): BigramLm = BigramLm(
    spark.read.parquet(s"$dir/lm_stats.parquet"),
    spark.read.parquet(s"$dir/lm_unigrams.parquet"),
    spark.read.parquet(s"$dir/lm_bigrams.parquet"),
    spark.read.parquet(s"$dir/lm_meta.parquet").collect()(0).getAs[Double]("k"))

  /** Train a capped bigram LM over `text` (lowercased whitespace tokens,
    * [[Search.terms]] — the shared corpus tokenizer). */
  def trainBigramLm(
      docs: DataFrame,
      text: Column,
      vocabSize: Int,
      maxBigrams: Int,
      k: Double = 0.5): BigramLm = {
    require(vocabSize >= 1, s"trainBigramLm: vocabSize must be >= 1, got $vocabSize")
    require(maxBigrams >= 0, s"trainBigramLm: maxBigrams must be >= 0, got $maxBigrams")
    require(k > 0 && java.lang.Double.isFinite(k),
      s"trainBigramLm: smoothing k must be finite and > 0, got $k")
    val toks = docs.select(Search.terms(text).as("t"))
    // Lazy-pin the unigram counts: stats, the capped vocab, and BOTH
    // scoring-side lookups (term and prev) reference this subtree — without
    // the pin each reference re-runs the corpus scan + count shuffle.
    val uniAll = toks.select(explode(col("t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .transform(graft.operators.Pin.lazyPin)
    // Corpus stats come from the UNCAPPED counts: N and V are properties of
    // the training stream, not of the model cap (otherwise shrinking the
    // cap would inflate every smoothed probability).
    val stats = uniAll.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_tok"),
      count(lit(1)).as("v"))
    val unigrams = uniAll
      .orderBy(col("c").desc, col("term").asc)
      .limit(vocabSize)
    // Bigram stream: per-token fan-out with the previous token resolved
    // from the array itself (element_at is 1-based, pos is 0-based, so
    // element_at(t, pos) IS the predecessor) — no window, no self-join.
    val bigrams = toks
      .select(col("t"), posexplode(col("t")).as(Seq("i0", "w2")))
      .where(col("i0") > 0)
      .select(element_at(col("t"), col("i0")).as("w1"), col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc)
      .limit(maxBigrams)
    BigramLm(stats, unigrams, bigrams, k)
  }

  /** Score `docs` under `lm`: returns (id, n_tokens, lm_score) where
    * lm_score is the mean per-token negative log-probability rounded to
    * 6 dp (NULL for empty/null documents, which still appear with
    * n_tokens = 0). Lower is better.
    *
    * `carry` columns (evaluated against the INPUT frame, before the token
    * explode) ride the per-token rows and re-surface per doc via first()
    * — this lets a caller fuse other per-doc projections into this
    * operator's single corpus scan instead of joining a second scan back
    * on id (see [[QualityModel.ensembleQuality]]). */
  def scoreBigramLm(
      docs: DataFrame,
      id: Column,
      text: Column,
      lm: BigramLm,
      backoff: Double = 0.4,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    require(backoff > 0 && backoff <= 1 && java.lang.Double.isFinite(backoff),
      s"scoreBigramLm: backoff must be in (0, 1], got $backoff")
    val carryNames = carry.map(_._1)
    val carryCols = carryNames.map(col)
    val pos = docs
      .select(id.as("id") +: Search.terms(text).as("t") +:
        carry.map { case (n, c) => c.as(n) }: _*)
      // _outer keeps empty/null docs as a single null-term row, so they
      // survive to the final aggregation without a second doc-spine join
      .select(col("id") +: col("t") +:
        posexplode_outer(col("t")).as(Seq("i0", "term")) +: carryCols: _*)
      .select(col("id") +: col("i0") +: col("term") +:
        when(col("i0") > 0, element_at(col("t"), col("i0"))).as("prev") +:
        carryCols: _*)
    val uni = broadcast(lm.unigrams)
    // r15: the bigram branch's ratio c_bi/c_prev is a pure function of
    // the MODEL pair, so it is computed once per bigram on the capped
    // model side (an inner join of the two bounded model tables) instead
    // of a third string-keyed broadcast probe per token row. Exactness:
    // the division is the same double op on the same stored BIGINTs, and
    // `_bp IS NOT NULL` iff the old `c_bi IS NOT NULL AND c_prev IS NOT
    // NULL` (a bigram whose w1 fell out of the capped vocab drops out of
    // the inner join exactly where the old condition sent it to backoff).
    val bigramP = broadcast(
      lm.bigrams.join(
        lm.unigrams.select(col("term").as("w1"), col("c").as("_cp")), Seq("w1"))
        .select(col("w1").as("prev"), col("w2").as("term"),
          (col("c").cast("double") / col("_cp").cast("double")).as("_bp")))
    val joined = pos
      .join(uni.select(col("term"), col("c").as("c_uni")), Seq("term"), "left")
      .join(bigramP, Seq("prev", "term"), "left")
      .crossJoin(broadcast(lm.stats))
    // (c + k) / (N + k*(V+1)) — one division, literal-first products; the
    // SQL oracle renders the identical association term for term.
    val pUni = (coalesce(col("c_uni"), lit(0L)).cast("double") + lit(lm.k)) /
      (col("n_tok") + lit(lm.k) * (col("v") + lit(1L)))
    val p = when(col("i0") === 0, pUni)
      .when(col("_bp").isNotNull, col("_bp"))
      .otherwise(lit(backoff) * pUni)
    // Null-term rows (empty docs) must NOT contribute a backoff term.
    val nl = when(col("term").isNotNull, round(-log(p), 6).cast("decimal(28,6)"))
    // Mean at 6 dp via EXACT integer half-up — round(s/n, 6) on a double
    // is engine-divergent at half-way points (s/n is a small-denominator
    // rational, so unlike the ln() outputs it actually lands on them;
    // observed once in 5000 docs at sf0.1): u = s in micro-units, then
    // (2u + n) div (2n) is round-half-up(u/n) in pure BIGINT arithmetic.
    // n_tokens = 0 or s NULL propagate to a NULL score on both engines.
    joined
      .groupBy(col("id"))
      .agg(count(col("term")).as("n_tokens"), sum(nl).as("s") +:
        carryNames.map(n => first(col(n)).as(n)): _*)
      .withColumn("_u", (col("s") * lit(1000000)).cast("long"))
      .select(col("id") +: col("n_tokens") +:
        (expr("(_u * 2 + n_tokens) div (n_tokens * 2)").cast("double") / lit(1000000))
          .as("lm_score") +: carryCols: _*)
  }

  /** CCNet-style perplexity bucketing — split a corpus into head / middle
    * / tail by LM score (Wenzek et al. 2020: documents most similar to a
    * trusted LM's distribution are "head" and sampled preferentially;
    * the noisy tail is down-weighted or dropped). Thresholds are the
    * exact interpolated `headFrac` and `headFrac + midFrac` quantiles of
    * the corpus's mean-nll distribution; lower nll = closer to the LM =
    * head.
    *
    * Scale shape: the LM score's own single corpus pass, ONE 2-number
    * quantile aggregation, and a broadcast of those thresholds back onto
    * the scored frame as a pure projection — the corpus never shuffles
    * again. Documents with no tokens have NULL lm_score and get a NULL
    * bucket (same posture as [[QualityModel.ensembleQuality]]).
    *
    * Engine parity: lm_score is the 6-dp decimal contract; the quantile
    * is the proven percentile/quantile_cont interpolation (lower +
    * (upper-lower)*frac over identical doubles — txt_length_quantiles
    * precedent); bucket labels are two comparisons of identical doubles.
    *
    * @return (id, n_tokens, lm_score, ppl_bucket) */
  def perplexityBuckets(
      docs: DataFrame,
      id: Column,
      text: Column,
      lm: BigramLm,
      headFrac: Double = 0.1,
      midFrac: Double = 0.5): DataFrame = {
    require(headFrac > 0 && midFrac > 0 && headFrac + midFrac < 1,
      s"perplexityBuckets: need 0 < headFrac, 0 < midFrac, headFrac + midFrac < 1; " +
        s"got $headFrac / $midFrac")
    val scored = scoreBigramLm(docs, id, text, lm).transform(graft.operators.Pin.lazyPin)
    val thresholds = scored
      .filter(col("lm_score").isNotNull)
      .agg(
        percentile(col("lm_score"), lit(headFrac)).as("_t_head"),
        percentile(col("lm_score"), lit(headFrac + midFrac)).as("_t_mid"))
    scored
      .crossJoin(broadcast(thresholds))
      .select(col("id"), col("n_tokens"), col("lm_score"),
        when(col("lm_score").isNull, lit(null).cast("string"))
          .when(col("lm_score") <= col("_t_head"), lit("head"))
          .when(col("lm_score") <= col("_t_mid"), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Pointwise-mutual-information collocations — the phrase-mining pass of
    * a corpus pipeline (multi-word terms worth fusing before tokenizer
    * training; the PMI ranking of Mikolov et al. 2013's phrase step):
    *
    *   pmi(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) )
    *               = ln( (c_bi / M) / ((c_1 / N) * (c_2 / N)) )
    *
    * with M = total bigram contexts, N = total tokens. Only bigrams with
    * `minCount`+ occurrences rank (rare pairs have unreliable, inflated
    * PMI); the top `topK` by (pmi desc, w1, w2) return. PMI is rounded to
    * 6 dp, making the ranking deterministic and cross-engine identical
    * (the single ln() call agrees to far better than 1e-6; every other op
    * is exactly-rounded IEEE in a fixed association).
    *
    * Scale shape: the same two map-side-combined count aggregations as
    * [[trainBigramLm]] (no window, no self-join — predecessors resolve
    * from the token array), then two equi-joins of unigram counts onto
    * the minCount-FILTERED bigram table (the filter runs before the
    * joins, so only candidate phrases shuffle; AQE broadcasts the
    * filtered side when small), a 1-row stats cross-join, and a bounded
    * TakeOrdered cut — never a full sort.
    */
  def pmiCollocations(
      docs: DataFrame,
      text: Column,
      minCount: Long,
      topK: Int): DataFrame = {
    require(minCount >= 1, s"pmiCollocations: minCount must be >= 1, got $minCount")
    require(topK >= 1, s"pmiCollocations: topK must be >= 1, got $topK")
    val toks = docs.select(Search.terms(text).as("t"))
    val uni = toks.select(explode(col("t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .transform(graft.operators.Pin.lazyPin)
    val stats = uni.agg(coalesce(sum(col("c")), lit(0L)).as("_n_tok"))
    val bi = toks
      .select(col("t"), posexplode(col("t")).as(Seq("i0", "w2")))
      .where(col("i0") > 0)
      .select(element_at(col("t"), col("i0")).as("w1"), col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bi"))
      .transform(graft.operators.Pin.lazyPin)
    val biStats = bi.agg(coalesce(sum(col("c_bi")), lit(0L)).as("_m_bi"))
    val pmi = round(log(
      (col("c_bi").cast("double") / col("_m_bi").cast("double")) /
        ((col("c1").cast("double") / col("_n_tok").cast("double")) *
          (col("c2").cast("double") / col("_n_tok").cast("double")))), 6)
    bi.filter(col("c_bi") >= minCount)
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(biStats))
      .select(col("w1"), col("w2"), col("c_bi"), col("c1"), col("c2"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Jensen-Shannon vocabulary drift between two corpus snapshots — the
    * TEXTUAL counterpart of [[DataQuality.psiDrift]] (which bins a
    * numeric column): compare the unigram distributions of snapshots A
    * and B over their top-`vocabSize` UNION vocabulary, with all
    * remaining mass folded into an `<oov>` bucket (with Laplace
    * smoothing over the fixed `vocabSize + 1` term slots, so each
    * distribution sums to 1 exactly when the realized union vocabulary
    * fills all slots, and to slightly less when the corpus has fewer
    * distinct terms than `vocabSize` — the drift ranking is unaffected):
    *
    *   js = 0.5 * Σ_t p_t ln(p_t/m_t) + 0.5 * Σ_t q_t ln(q_t/m_t),
    *   m = (p + q)/2
    *
    * Laplace-smoothed shares p_t = (c_t + 1)/(n + |V|+1) keep every log
    * finite; shares are exact rationals (identical doubles on any
    * engine) and per-term contributions are rounded to integer NANO
    * units and long-summed — the [[DataQuality.psiDrift]] parity
    * discipline (BIGINT end to end; no DECIMAL output column ever
    * ships). js_n9 ∈ [0, ln 2 · 10⁹]; 0 = identical vocabularies.
    *
    * Scale shape: one count aggregation per snapshot, a TakeOrdered
    * vocab cut on their union (deterministic (count desc, term) ties),
    * two broadcast joins of the tiny vocab back onto the count tables,
    * |V|+1 rows after that. Corpora never shuffle by content.
    *
    * @return one row per vocab term (+ `<oov>`): (term, c_a, c_b,
    *         contrib_n9) plus the constant `js_n9`, ordered by term. */
  def vocabularyDrift(
      a: DataFrame, b: DataFrame, text: Column, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabularyDrift: vocabSize must be >= 1, got $vocabSize")
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(explode(Search.terms(text)).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(out))
        .transform(graft.operators.Pin.lazyPin)
    val ca = counts(a, "c_a")
    val cb = counts(b, "c_b")
    val vocab = ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("c_a"), lit(0L)) + coalesce(col("c_b"), lit(0L))).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"))
    // the preserved side of an outer join cannot be the broadcast side,
    // so shrink each count table to the vocab FIRST (broadcast semi-join
    // — the scale-bearing step), then outer-join the ≤|V|-row leftovers
    val caV = ca.join(broadcast(vocab), Seq("term"), "left_semi")
    val cbV = cb.join(broadcast(vocab), Seq("term"), "left_semi")
    val joined = vocab
      .join(caV, Seq("term"), "left")
      .join(cbV, Seq("term"), "left")
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .transform(graft.operators.Pin.lazyPin)
    val totals = ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("t_a"))
      .crossJoin(cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("t_b")))
      .crossJoin(joined.agg(
        coalesce(sum(col("c_a")), lit(0L)).as("v_a"),
        coalesce(sum(col("c_b")), lit(0L)).as("v_b")))
    val withOov = joined.unionByName(
      broadcast(totals).select(lit("<oov>").as("term"),
        (col("t_a") - col("v_a")).as("c_a"), (col("t_b") - col("v_b")).as("c_b")))
    val denomTerms = lit((vocabSize + 1).toLong)
    val p = (col("c_a") + lit(1L)).cast("double") / (col("t_a") + denomTerms)
    val q = (col("c_b") + lit(1L)).cast("double") / (col("t_b") + denomTerms)
    val m = (p + q) / lit(2.0)
    val contrib = round((lit(0.5) * (p * log(p / m)) + lit(0.5) * (q * log(q / m)))
      * lit(1e9)).cast("long")
    val withContrib = withOov.crossJoin(broadcast(totals.select(col("t_a"), col("t_b"))))
      .withColumn("contrib_n9", contrib)
      .transform(graft.operators.Pin.lazyPin)
    // the total stays BIGINT nanos: DECIMAL (and raw-double) output
    // columns are the two physical types different runtimes render
    // differently even at identical values
    val js = withContrib.agg(sum(col("contrib_n9")).as("js_n9"))
    withContrib
      .select(col("term"), col("c_a"), col("c_b"), col("contrib_n9"))
      .crossJoin(broadcast(js))
      .orderBy(col("term"))
  }
}
