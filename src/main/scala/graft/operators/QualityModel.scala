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
    val sumMilli = aggregate(col("_qm_toks"), lit(0L), (acc, t) =>
      acc + element_at(weightLit,
        (pmod(TextFunctions.portableHash32(t), lit(NumBuckets)) + lit(1)).cast("int")))
    docs
      .select(id.as("id"), toks.as("_qm_toks"))
      .select(
        col("id"),
        size(col("_qm_toks")).cast("long").as("n_tokens"),
        when(size(col("_qm_toks")) === 0, lit(0.0))
          .otherwise(sumMilli.cast("double") / lit(1000.0) / size(col("_qm_toks")))
          .as("score"))
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
      .localCheckpoint(false) // every iteration re-reads the feature frame
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

  /** Inference column for [[trainLogReg]] weights: σ(w·x) as a pure
    * projection (same margin association order as training). */
  def logRegScore(features: Seq[Column], w: Seq[Double]): Column = {
    require(features.size == w.size, "logRegScore: features/weights arity mismatch")
    val margin = w.indices.map(i => lit(w(i)) * features(i).cast("double")).reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }
}
