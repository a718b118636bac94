package graft.fdr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Target-decoy FDR / q-value computation (SURVEY.md §2.4 A14, §2.5 W2).
  *
  * The reference delegates this to the PIA library
  * (PIAModelerService.java:66-76: `calculateAllFDR`,
  * `calculateCombinedFDRScore`); here it is re-derived from the published
  * target-decoy method as window-function transformations:
  *
  *  1. sort PSMs best-score-first (with a unique tiebreak for determinism);
  *  2. running decoy / target counts give `FDR_i = decoys_i / max(targets_i, 1)`;
  *  3. `q_i = min(FDR_j : j >= i)` — the reverse running minimum, computed as a
  *     forward running `min` over the exactly-reversed sort order.
  *
  * Scale note: windows are partitioned by the caller's grouping columns
  * (assay/search-engine) — each assay sorts independently, so the shuffle is
  * one hash partitioning by assay, never a global sort. A single assay is at
  * most ~800k PSMs in the reference corpus (BASELINE.md), which fits one task
  * comfortably.
  */
object TargetDecoy {

  /** Adds `cum_decoys`, `cum_targets`, `fdr`, `q_value` columns.
    *
    * @param partitionBy  group columns (per-assay / per-search-engine FDR)
    * @param score        PSM score column
    * @param isDecoy      boolean decoy flag
    * @param tieBreak     unique column for deterministic ordering on ties
    * @param lowerIsBetter true when smaller scores are better (e-values/PEP)
    */
  def withQValues(
      df: DataFrame,
      partitionBy: Seq[Column],
      score: Column,
      isDecoy: Column,
      tieBreak: Column,
      lowerIsBetter: Boolean = false,
  ): DataFrame = {
    val bestFirst =
      if (lowerIsBetter) Seq(score.asc, tieBreak.asc) else Seq(score.desc, tieBreak.asc)
    // exact reverse of bestFirst, so that "rows at or after i in best-first
    // order" === "rows at or before i in worst-first order"
    val worstFirst =
      if (lowerIsBetter) Seq(score.desc, tieBreak.desc) else Seq(score.asc, tieBreak.desc)

    val wBest = Window
      .partitionBy(partitionBy: _*)
      .orderBy(bestFirst: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wWorst = Window
      .partitionBy(partitionBy: _*)
      .orderBy(worstFirst: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    df.withColumn("cum_decoys", sum(when(isDecoy, 1L).otherwise(0L)).over(wBest))
      .withColumn("cum_targets", sum(when(isDecoy, 0L).otherwise(1L)).over(wBest))
      .withColumn("fdr", col("cum_decoys").cast("double") / greatest(col("cum_targets"), lit(1L)))
      .withColumn("q_value", min(col("fdr")).over(wWorst))
  }

  /** P9 — q-value repair: q == 0 is replaced by `min(positive q) / 10`
    * rounded HALF_UP to 6 dp (NaN when no positive q exists in the group).
    * Reference: SubmissionPipelineUtils.getQValueLower:368-377 (BigDecimal
    * setScale(6, HALF_UP) — Spark's `round` is also HALF_UP).
    *
    * The group-global minimum is a windowed aggregate over the assay
    * partition — no driver round-trip, no cross join. */
  def repairZeroQValues(df: DataFrame, q: Column, partitionBy: Seq[Column], outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*)
    val minPos = min(when(q > 0.0, q)).over(w)
    df.withColumn(
      outCol,
      when(q > 0.0, q).otherwise(
        when(minPos.isNull, lit(Double.NaN)).otherwise(round(minPos / 10.0, 6))
      ),
    )
  }
}
