package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear quality scorer — MODEL INFERENCE AS COLUMNS. The
  * standard corpus-quality classifier shape (fastText-style: hash each
  * token into a fixed-width bucket table, sum the bucket weights,
  * normalize by length) expressed as a zero-shuffle projection: the
  * weight table is a plan-time literal array, the fold is a higher-order
  * aggregate over the token array, and nothing leaves the scan stage.
  * At 100 TB this is the difference between "run the classifier" being
  * a projection versus a join against a weights table.
  *
  * The weights here are a deterministic PLACEHOLDER spread (this
  * environment has no trained model to load — same honesty contract as
  * the multimodal decode stub); swapping in real trained weights changes
  * one literal table, not the execution shape. Weights are integer
  * milli-units so the fold is exact long arithmetic — order-free, hence
  * bit-identical in any engine (see the `txt_quality_model` oracle).
  */
object QualityModel {

  val NumBuckets = 64

  /** Placeholder weights in milli-units, Knuth-hash spread over [-500, 500]. */
  val weightsMilli: IndexedSeq[Long] =
    (0 until NumBuckets).map(i => ((i * 2654435761L) % 1001) - 500)

  private def weightLit: Column = array(weightsMilli.map(lit): _*)

  /** Score each document: (id, n_tokens, score) with
    * score = (milliSum / 1000) / n_tokens (fixed double evaluation
    * order), 0.0 for empty or null text.
    *
    * Tokenization happens ONCE in a dedicated projection (the split +
    * higher-order filter is the per-row hot cost; HOFs are
    * CodegenFallback, so common-subexpression elimination cannot be
    * relied on to dedupe repeated embeddings). Null text coalesces to an
    * empty array up front, which also keeps the contract independent of
    * the ANSI/`legacy.sizeOfNull` setting (`size(null)` is -1 with ANSI
    * off — the naive null guard would report n_tokens -1).
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = coalesce(TextFunctions.tokens(text), array())
    docs
      .select(id.as("id"), toks.as("_qm_toks"))
      .select(
        col("id"),
        size(col("_qm_toks")).cast("long").as("n_tokens"),
        scoreColumn(col("_qm_toks")).as("score"))
  }

  /** The hashed-linear score as a bare column over a PRE-TOKENIZED array
    * — (milliSum / 1000) / n_tokens in that fixed double association,
    * 0.0 for an empty array. Shared by [[scoreDocs]] and
    * [[ensembleQuality]] so the ensemble fuses this scorer into an
    * existing projection instead of paying a second corpus scan. */
  def scoreColumn(toks: Column): Column = {
    val sumMilli = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(weightLit,
        (pmod(TextFunctions.portableHash32(t), lit(NumBuckets)) + lit(1)).cast("int")))
    when(size(toks) === 0, lit(0.0))
      .otherwise(sumMilli.cast("double") / lit(1000.0) / size(toks))
  }

  /** MODEL TRAINING AS AGGREGATION: distributed full-batch gradient
    * descent for a logistic-regression quality classifier (the
    * FineWeb-Edu / CCNet-style "train a small quality model over corpus
    * features, then gate on its score" step) — each iteration is ONE
    * map-side-combined aggregation over the feature frame, with only d+1
    * numbers reaching the driver.
    *
    *   w_{t+1}(j) = w_t(j) + lr * (Σ_i q((y_i - σ(w_t·x_i)) * x_ij) / n)
    *
    * Determinism contract (the same discipline as the LM scorer): per-row
    * gradient contributions are quantized to integer nano-units via
    * `floor(x*1e9 + 0.5)` (bit-identical IEEE everywhere, unlike
    * `round(double)`) and summed as exact BIGINT — so the gradient is
    * independent of partitioning/aggregation order, the weight updates
    * are single IEEE ops, and the whole training loop replays
    * bit-identically in the DuckDB oracle (σ rides on ln/exp parity,
    * which every score oracle in this file already relies on).
    *
    * Callers drop the caveat that rows where any feature or the label is
    * NULL are excluded (they cannot contribute a gradient); features
    * should include an explicit bias column (`lit(1.0)`).
    *
    * @return trained weights, one per feature column. */
  def trainLogReg(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      iters: Int = 2,
      lr: Double = 0.5): Seq[Double] = {
    require(features.nonEmpty, "trainLogReg: features must be non-empty")
    require(iters >= 1 && iters <= 50, s"trainLogReg: iters must be in [1, 50], got $iters")
    require(lr > 0 && java.lang.Double.isFinite(lr),
      s"trainLogReg: lr must be finite and > 0, got $lr")
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"x$i") } :+
      label.cast("double").as("y")
    val data = df.select(cols: _*)
      .na.drop() // a NULL feature/label row cannot contribute a gradient
      .transform(graft.operators.Pin.lazyPin) // every iteration re-reads the feature frame
    var w = Seq.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val margin = (0 until d).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val g = col("y") - p
      // integer nano-unit quantization: exact associative sums
      val aggs = (0 until d).map { i =>
        sum(floor(g * col(s"x$i") * lit(1e9) + lit(0.5)).cast("long")).as(s"g$i")
      } :+ count(lit(1)).as("n")
      val row = data.agg(aggs.head, aggs.tail: _*).collect().head
      val n = row.getAs[Long]("n")
      require(n > 0, "trainLogReg: no trainable rows (all had NULL features/label)")
      w = (0 until d).map { i =>
        w(i) + lr * (row.getAs[Long](s"g$i").toDouble / 1e9 / n)
      }
    }
    w
  }

  /** Persist trained [[trainLogReg]] weights as one parquet table
    * (idx, weight) — the classifier artifact (round-13): index order is
    * the feature order and is stored explicitly; stored doubles round-
    * trip bit-exactly, so a reloaded model scores identically. */
  def saveWeights(
      spark: org.apache.spark.sql.SparkSession, w: Seq[Double], dir: String): Unit = {
    import spark.implicits._
    w.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "weight")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/logreg_weights.parquet")
  }

  /** Load a [[saveWeights]] artifact, restoring feature order. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    spark.read.parquet(s"$dir/logreg_weights.parquet")
      .select(org.apache.spark.sql.functions.col("idx"),
        org.apache.spark.sql.functions.col("weight"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq

  /** Inference column for [[trainLogReg]] weights: σ(w·x) as a pure
    * projection (same margin association order as training). */
  def logRegScore(features: Seq[Column], w: Seq[Double]): Column = {
    require(features.size == w.size, "logRegScore: features/weights arity mismatch")
    val margin = w.indices.map(i => lit(w(i)) * features(i).cast("double")).reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Document-quality ENSEMBLE — the FineWeb/DCLM-style "no single signal
    * is trustworthy" gate: three independent quality signals per document
    * (heuristic rule score, hashed-linear model score, bigram-LM mean
    * negative-log-likelihood), each CALIBRATED to its empirical corpus
    * CDF (quantile normalization — the signals live on incomparable
    * scales, so raw averaging would let whichever signal has the widest
    * range dominate), combined as a fixed weighted mean. The LM signal is
    * inverted (lower nll = higher quality).
    *
    * Scale shape: ONE corpus scan — the heuristic kernel and the hashed
    * scorer ride [[LanguageModel.scoreBigramLm]]'s projection via its
    * `carry` columns, so no per-doc join of separate scans ever happens.
    * Calibration is a 3x`buckets`-bounded histogram (one map-side-combined
    * aggregation of the scored frame), a window over those bounded rows,
    * and three broadcast joins back. The corpus shuffles once (the LM
    * score's own per-doc aggregation), exactly as scoreBigramLm alone.
    *
    * Engine parity: the heuristic and model signals are exact rational
    * arithmetic; the LM signal is the proven 6-dp-decimal contract;
    * calibrated values are BIGINT-count ratios (one exact division); the
    * ensemble is a fixed-association IEEE weighted mean of those — every
    * shipped double replays bit-identically in SQL.
    *
    * Documents with no tokens keep n_tokens = 0 and a NULL lm_score, so
    * their cal_lm and ensemble are NULL — an empty document has no
    * defensible quality, and silently scoring it 0 or 1 would bias
    * downstream gates; filter on `ensemble IS NOT NULL` to drop them.
    *
    * @param buckets calibration histogram resolution per signal
    * @return (id, n_tokens, q_heuristic, q_model, lm_score,
    *         cal_heuristic, cal_model, cal_lm, ensemble) */
  def ensembleQuality(
      docs: DataFrame,
      id: Column,
      text: Column,
      lm: LanguageModel.BigramLm,
      buckets: Int = 20,
      weights: (Double, Double, Double) = (0.25, 0.35, 0.40)): DataFrame = {
    require(buckets >= 2, s"ensembleQuality: buckets must be >= 2, got $buckets")
    val toks = coalesce(TextFunctions.tokens(text), array())
    val scored = LanguageModel.scoreBigramLm(docs, id, text, lm, carry = Seq(
        "q_heuristic" ->
          coalesce(TextFunctions.qualityMetrics(text).getField("quality_score"), lit(0.0)),
        "q_model" -> scoreColumn(toks)))
      .transform(graft.operators.Pin.lazyPin)
    // clamped equi-width bins, the binnedAuc/calibrationReport shape;
    // signal ranges are structural: heuristic in [0,1] (CASE sum), model
    // in [-0.5, 0.5] (weights capped at |500| milli / token), lm nll >= 0
    def bin(s: Column, lo: Double, hi: Double): Column =
      least(lit(buckets - 1), greatest(lit(0),
        floor((s - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo)).cast("int")))
    val binned = scored.select(
        col("id"), col("n_tokens"), col("q_heuristic"), col("q_model"), col("lm_score"),
        bin(col("q_heuristic"), 0.0, 1.0).as("_bh"),
        bin(col("q_model"), -1.0, 1.0).as("_bm"),
        when(col("lm_score").isNotNull, bin(col("lm_score"), 0.0, 16.0)).as("_bl"))
      .transform(graft.operators.Pin.lazyPin)
    val hist = binned
      .select(expr("stack(3, 0, _bh, 1, _bm, 2, _bl) AS (sig, bin)"))
      .filter(col("bin").isNotNull)
      .groupBy(col("sig"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("sig").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("sig")
    // pin the (<= 3*buckets)-row CDF: the three cal() broadcast joins each
    // filter this frame, and without the pin every filter re-executes the
    // whole histogram DAG — 3 extra passes over the corpus-sized binned
    // frame (seen in the executed plan before this)
    val cdf = hist
      .withColumn("cdf", sum(col("n")).over(wCum).cast("double") /
        sum(col("n")).over(wTot).cast("double"))
      .select(col("sig"), col("bin"), col("cdf"))
      .transform(graft.operators.Pin.lazyPin)
    def cal(sig: Int, binCol: String, outName: String): DataFrame =
      broadcast(cdf.filter(col("sig") === sig)
        .select(col("bin").as(binCol), col("cdf").as(outName)))
    val (wh, wm, wl) = weights
    binned
      .join(cal(0, "_bh", "cal_heuristic"), Seq("_bh"), "left")
      .join(cal(1, "_bm", "cal_model"), Seq("_bm"), "left")
      .join(cal(2, "_bl", "cal_lm"), Seq("_bl"), "left")
      .select(col("id"), col("n_tokens"), col("q_heuristic"), col("q_model"),
        col("lm_score"), col("cal_heuristic"), col("cal_model"), col("cal_lm"),
        (lit(wh) * col("cal_heuristic") + lit(wm) * col("cal_model") +
          lit(wl) * (lit(1.0) - col("cal_lm"))).as("ensemble"))
  }
}
