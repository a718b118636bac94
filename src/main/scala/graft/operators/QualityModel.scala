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

  /** (sum of bucket weights in milli, token count) for `text`. */
  private def folded(text: Column): (Column, Column) = {
    val toks = TextFunctions.tokens(text)
    val sumMilli = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(weightLit,
        (pmod(TextFunctions.portableHash32(t), lit(NumBuckets)) + lit(1)).cast("int")))
    (sumMilli, size(toks))
  }

  /** Score each document: (id, n_tokens, score) with
    * score = (milliSum / 1000) / n_tokens (fixed double evaluation
    * order), 0.0 for empty or null text.
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val (sumMilli, n) = folded(text)
    docs.select(
      id.as("id"),
      coalesce(n, lit(0)).cast("long").as("n_tokens"),
      when(n.isNull || n === 0, lit(0.0))
        .otherwise(sumMilli.cast("double") / lit(1000.0) / n)
        .as("score"))
  }
}
