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
}
