package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates for corpus ingest — the expectation checks and
  * distribution-drift monitors that decide whether a new batch/snapshot
  * is fit to enter the training pipeline at all.
  */
object DataQuality {

  /** Expectation report: one row per rule with its violation count over
    * the frame — the "great-expectations" contract check as ONE
    * map-side-combined aggregation (every rule is a conditional count in
    * the same pass; no per-rule scans). A NULL predicate counts as a
    * VIOLATION: an expectation that cannot be evaluated is not met.
    *
    * @param rules (name, predicate) pairs; names must be unique.
    * @return (rule, n_rows, n_violations, pass) ordered by rule. */
  def expectationReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectationReport: rules must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size,
      "expectationReport: rule names must be unique")
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), lit(1L)).otherwise(lit(0L))).as(s"_v_$name")
    } :+ count(lit(1)).as("_n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col("_n").as("n_rows"),
          col(s"_v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  /** Population-stability-index drift between two snapshots of a numeric
    * column, over `buckets` equal-width bins on [lo, hi) with out-of-range
    * values clamped into the edge bins:
    *
    *   psi = Σ_b (p_b - q_b) * ln(p_b / q_b)
    *
    * with Laplace-smoothed shares p_b = (n_b + 1)/(n + buckets) — exact
    * rationals, so the shares are identical doubles on any engine, and
    * no bin can zero the logarithm. Per-bin contributions are rounded to
    * 9 dp and decimal-summed (order-independent), so the total replays
    * bit-identically cross-engine. The usual gate: psi < 0.1 stable,
    * 0.1-0.25 drifting, > 0.25 shifted.
    *
    * One aggregation per side (map-side combined, `buckets` rows out);
    * NULL values are excluded from both counts.
    *
    * @return one row per bin: (bucket, n_a, n_b, contrib) plus the
    *         constant `psi` total, ordered by bucket. */
  def psiDrift(
      a: DataFrame, b: DataFrame, c: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 2, s"psiDrift: buckets must be >= 2, got $buckets")
    require(hi > lo, s"psiDrift: need hi > lo, got [$lo, $hi)")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(c.cast("double").as("_x")).filter(col("_x").isNotNull)
      .select(least(lit(buckets - 1), greatest(lit(0),
        floor((col("_x") - lit(lo)) * lit(buckets) / lit((hi - lo).toDouble)).cast("int")))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    val bins = a.sparkSession.range(buckets).select(col("id").cast("int").as("bucket"))
    val joined = bins
      .join(binned(a, "n_a"), Seq("bucket"), "left")
      .join(binned(b, "n_b"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val p = (col("n_a") + lit(1L)).cast("double") / (col("t_a") + lit(buckets.toLong))
    val q = (col("n_b") + lit(1L)).cast("double") / (col("t_b") + lit(buckets.toLong))
    val contrib = round((p - q) * log(p / q), 9).cast("decimal(28,9)")
    val withContrib = joined.crossJoin(broadcast(totals))
      .withColumn("contrib", contrib)
    val psi = withContrib.agg(sum(col("contrib")).cast("double").as("psi"))
    withContrib
      .select(col("bucket"), col("n_a"), col("n_b"), col("contrib"))
      .crossJoin(broadcast(psi))
      .orderBy(col("bucket"))
  }
}
