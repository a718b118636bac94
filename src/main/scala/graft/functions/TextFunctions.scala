package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting,
  * shingling, and a portable 32-bit string hash.
  *
  * All pure `Column` expressions (codegen-friendly, no UDFs). The hash is
  * "portable" in the sense that an identical value is computable in ANSI SQL
  * (md5-prefix as an integer), which the correctness oracle relies on.
  */
object TextFunctions {

  /** Whitespace tokenizer: non-empty tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish token-count estimate: whitespace tokens plus an extra token per
    * run of non-alphanumeric characters (punctuation splits in subword
    * vocabularies). */
  def tokenCountEstimate(text: Column): Column =
    size(tokens(text)) + coalesce(regexp_count(text, lit("[^A-Za-z0-9\\s]+")), lit(0))

  /** Portable 32-bit positive hash: first 8 hex digits of md5 as a long in
    * [0, 2^32). Identical in any engine with md5 + hex parsing. */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles (distinct, first-occurrence order), the
    * MinHash/Jaccard input unit. Evaluates through the native codegen
    * kernel ([[WordShinglesExpr]]) — the column-expression fold below is
    * value-identical (property-tested) and remains the no-session
    * fallback plus the oracle's reference semantics.
    *
    * Session caveat: the kernel registers on the THREAD-LOCAL active
    * session at column-build time; for a DataFrame owned by a different
    * session (`newSession()`), call
    * [[GraftFunctions.ensureRegistered]]`(df.sparkSession)` first (every
    * graft operator entry point already does). */
  def wordShingles(text: Column, n: Int): Column =
    WordShinglesExpr.shinglesCol(text, n)

  /** Unicode NFC canonicalization (native codegen kernel,
    * [[NfcNormalizeExpr]]) — run BEFORE any dedup/fingerprint/tokenize
    * stage so composed and decomposed spellings of the same grapheme
    * cannot dodge an exact or near-dup match. */
  def nfcNormalize(text: Column): Column = NfcNormalizeExpr.normalizeCol(text)

  /** The higher-order-function form of [[wordShingles]] — interpreted
    * lambdas per window; kept as the reference semantics and fallback. */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", t))))
  }

  /** Intra-document repetition score (the Gopher-style duplicate-n-gram
    * quality signal): 1 - distinct n-gram shingles / total n-gram windows,
    * 0.0 for documents too short to window. High values mean boilerplate /
    * looped text — a standard corpus-quality reject rule. */
  def repetitionScore(text: Column, n: Int = 3): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(1)).cast("double")
    val distinctN = size(wordShingles(text, n)).cast("double")
    lit(1.0) - distinctN / total
  }

  /** Normalized-text fingerprint: lowercase, strip non-alphanumerics to
    * single spaces, trim, md5. Two documents differing only in case,
    * punctuation, or whitespace collide — the standard first-pass dedup key. */
  def normalizedFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Polynomial rolling hash of the token stream (base 31, mod 2^31-1), a
    * deterministic order-sensitive document fingerprint. The modulus keeps
    * every intermediate below 2^63 (acc < 2^31, so acc*31 + h < 2^37) —
    * overflow-free in any int64 engine, hence oracle-reproducible. */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // 2^31 - 1
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(portableHash32(t), p), p),
    )
  }

  /** Stopword lexicons for the language-ID heuristic (tiny, public common
    * word lists). */
  val StopwordLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"),
  )

  /** Count of tokens that appear in the given lexicon. */
  def stopwordHits(text: Column, lexicon: Seq[String]): Column = {
    val lex = array(lexicon.map(lit): _*)
    size(filter(tokens(text), t => array_contains(lex, t)))
  }

  /** Language-ID heuristic: the language whose stopword lexicon has the most
    * hits; "und" (undetermined) when no lexicon hits at all. Ties break
    * alphabetically for determinism. */
  def langIdHeuristic(text: Column): Column = {
    val scored = StopwordLexicons.toSeq.sortBy(_._1).map { case (lang, lex) =>
      struct(stopwordHits(text, lex).as("hits"), lit(lang).as("lang"))
    }
    val best = aggregate(
      array(scored: _*),
      struct(lit(-1).as("hits"), lit("und").as("lang")),
      (acc, x) => when(x.getField("hits") > acc.getField("hits"), x).otherwise(acc),
    )
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality metrics struct: token count, mean token length, stopword ratio,
    * non-alphanumeric ratio, and a composite [0,1] quality score (heuristics
    * in the spirit of published LLM-corpus quality filters: length,
    * punctuation and stopword signals). Evaluates through the native
    * single-pass kernel ([[QualityMetricsExpr]]); the column-expression
    * form below is value-identical (property-tested) and remains the
    * no-session fallback plus the oracle's reference semantics. */
  def qualityMetrics(text: Column): Column =
    QualityMetricsExpr.metricsCol(text)

  /** The higher-order-function form of [[qualityMetrics]] — interpreted
    * lambdas and separate regex passes; kept as the reference semantics
    * and fallback. */
  def qualityMetricsHof(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val meanLen = when(nTok > 0, aggregate(t, lit(0L), (a, x) => a + length(x)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      stopwordHits(text, StopwordLexicons("en")).cast("double") / nTok).otherwise(lit(0.0))
    val punctRatio =
      when(length(text) > 0,
        (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
          length(text).cast("double")).otherwise(lit(0.0))
    val lengthOk = (nTok >= 10 && nTok <= 10000).cast("double")
    val score = lengthOk * lit(0.4) +
      when(stopRatio > 0.02, lit(0.3)).otherwise(lit(0.0)) +
      when(punctRatio < 0.2, lit(0.3)).otherwise(lit(0.0))
    struct(
      nTok.cast("long").as("n_tokens"),
      meanLen.as("mean_token_len"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      score.as("quality_score"),
    )
  }
}
