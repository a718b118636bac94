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
    * integer NANO units (round(x·10⁹) → BIGINT) and long-summed —
    * order-independent exact integer arithmetic, and the shipped columns
    * are BIGINT end to end: a DECIMAL (or raw-double) output column is
    * the one physical type different runtimes render differently, so it
    * never ships (the r6→r9 oracle lesson, final form). Gate in nano
    * units: psi_n9 < 1e8 stable, 1e8–2.5e8 drifting, > 2.5e8 shifted.
    *
    * One aggregation per side (map-side combined, `buckets` rows out);
    * NULL values are excluded from both counts.
    *
    * @return one row per bin: (bucket, n_a, n_b, contrib_n9) plus the
    *         constant `psi_n9` total, ordered by bucket. */
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
    val contrib = round((p - q) * log(p / q) * lit(1e9)).cast("long")
    val withContrib = joined.crossJoin(broadcast(totals))
      .withColumn("contrib_n9", contrib)
    val psi = withContrib.agg(sum(col("contrib_n9")).as("psi_n9"))
    withContrib
      .select(col("bucket"), col("n_a"), col("n_b"), col("contrib_n9"))
      .crossJoin(broadcast(psi))
      .orderBy(col("bucket"))
  }

  /** Binned two-sample Kolmogorov–Smirnov drift statistic — the
    * distribution-shift test that, unlike [[psiDrift]], needs NO
    * smoothing and carries NO transcendental: with the same clamped
    * equal-width binning,
    *
    *   ks = max_b | F_a(b) - F_b(b) |
    *
    * over the binned empirical CDFs. Cumulative counts are exact
    * integers (a running-sum window over `buckets` rows), each CDF value
    * is ONE exactly-rounded division, the difference and max are exact —
    * bit-identical cross-engine with no rounding discipline at all.
    * Classical gate at 5%: ks > 1.358·sqrt((n_a+n_b)/(n_a·n_b)).
    *
    * Scale shape: one aggregation per side (map-side combined, `buckets`
    * rows out); the window runs over the `buckets`-row frame, never the
    * input. Empty sides are rejected loudly (an empty CDF is undefined).
    *
    * @return one row per bin: (bucket, n_a, n_b, cum_a, cum_b, cdf_a,
    *         cdf_b, d) plus the constant `ks`, ordered by bucket. */
  def ksDrift(
      a: DataFrame, b: DataFrame, c: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 2, s"ksDrift: buckets must be >= 2, got $buckets")
    require(hi > lo, s"ksDrift: need hi > lo, got [$lo, $hi)")
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
    // the window frame is the buckets-row summary, never the input
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = joined.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val cdfed = joined
      .withColumn("cum_a", sum(col("n_a")).over(w))
      .withColumn("cum_b", sum(col("n_b")).over(w))
      .crossJoin(broadcast(totals))
      // the emptiness guard rides INSIDE the surviving cdf columns — a
      // standalone guard column would be pruned away unevaluated
      .withColumn("cdf_a", col("cum_a").cast("double") /
        when(col("t_a") > 0L, col("t_a")).otherwise(
          raise_error(lit("ksDrift: both sides must be non-empty"))).cast("double"))
      .withColumn("cdf_b", col("cum_b").cast("double") /
        when(col("t_b") > 0L, col("t_b")).otherwise(
          raise_error(lit("ksDrift: both sides must be non-empty"))).cast("double"))
      .withColumn("d", abs(col("cdf_a") - col("cdf_b")))
      .transform(graft.operators.Pin.lazyPin)
    val ks = cdfed.agg(max(col("d")).as("ks"))
    cdfed
      .select(col("bucket"), col("n_a"), col("n_b"), col("cum_a"), col("cum_b"),
        col("cdf_a"), col("cdf_b"), col("d"))
      .crossJoin(broadcast(ks))
      .orderBy(col("bucket"))
  }

  /** Binned two-sample Wasserstein-1 (earth-mover) drift — the
    * distribution-shift metric that, unlike [[ksDrift]]'s max-gap,
    * weighs HOW FAR mass moved, not just the largest CDF gap (a small
    * shift of every value and a large shift of a few values can share a
    * KS statistic; their W1 differs). Same clamped equal-width grid:
    *
    *   w1 = Σ_b |F_a(b) - F_b(b)| · binWidth
    *
    * carried as the EXACT INTEGER numerator
    * `diff_num_b = |cum_a·t_b - cum_b·t_a|` per bin (the CDF difference
    * over the common denominator t_a·t_b), so the statistic is
    * `(Σ diff_num / (t_a·t_b)) · binWidth` — one int→double conversion
    * each and two IEEE ops, bit-identical cross-engine with no rounding
    * discipline. BIGINT-exact to t_a·t_b < 2^63 (n ≈ 3·10⁹ a side; cast
    * to DECIMAL beyond, as [[binnedAuc]]).
    *
    * Scale shape: identical to [[ksDrift]] — one map-side-combined
    * aggregation per side to `buckets` rows; the cumulative window runs
    * over the summary frame, never the input.
    *
    * @return one row per bin: (bucket, n_a, n_b, cum_a, cum_b, diff_num)
    *         plus the constants `w1_num` and `w1` (value units), ordered
    *         by bucket */
  def wassersteinDrift(
      a: DataFrame, b: DataFrame, c: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 2, s"wassersteinDrift: buckets must be >= 2, got $buckets")
    require(hi > lo, s"wassersteinDrift: need hi > lo, got [$lo, $hi)")
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
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = joined.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val diffed = joined
      .withColumn("cum_a", sum(col("n_a")).over(w))
      .withColumn("cum_b", sum(col("n_b")).over(w))
      .crossJoin(broadcast(totals))
      // emptiness guard rides inside the surviving column (ksDrift lesson)
      .withColumn("diff_num",
        abs(col("cum_a") * when(col("t_b") > 0L, col("t_b")).otherwise(
          raise_error(lit("wassersteinDrift: both sides must be non-empty")).cast("long"))
          - col("cum_b") * when(col("t_a") > 0L, col("t_a")).otherwise(
            raise_error(lit("wassersteinDrift: both sides must be non-empty")).cast("long"))))
      .transform(graft.operators.Pin.lazyPin)
    val binWidth = (hi - lo).toDouble / buckets
    val tot = diffed
      .agg(sum(col("diff_num")).as("w1_num"),
        first(col("t_a")).as("_ta"), first(col("t_b")).as("_tb"))
      .select(col("w1_num"),
        (col("w1_num").cast("double") / (col("_ta") * col("_tb")).cast("double")
          * lit(binWidth)).as("w1"))
    diffed
      .select(col("bucket"), col("n_a"), col("n_b"), col("cum_a"), col("cum_b"),
        col("diff_num"))
      .crossJoin(broadcast(tot))
      .orderBy(col("bucket"))
  }

  /** Binned ROC-AUC for a scored binary outcome — the ranking-quality
    * gate for a corpus quality model (complementing
    * [[calibrationReport]]'s probability-quality view): scores bin into
    * clamped equal-width buckets, predicted-positive-first means
    * descending buckets, and the AUC is the trapezoid area over the
    * binned ROC — computed as an EXACT INTEGER numerator:
    *
    *   auc = Σ_b fp_b · (2·cumTP_{before b} + tp_b)  /  (2·P·N)
    *
    * (within-bucket score ties contribute the standard half credit).
    * Everything is BIGINT until the single trailing division, so the
    * result is bit-identical cross-engine with no rounding discipline —
    * and partitioning-independent by construction. BIGINT-exact to
    * P·N < 2^63 (n ≈ 3·10⁹; cast to DECIMAL beyond, as [[cohenKappa]]).
    *
    * Scale shape: ONE map-side-combined aggregation to `buckets` rows;
    * the cumulative window runs over that summary frame, never the
    * input. Rows with NULL score or label are excluded (they rank
    * nothing); an input with no positives or no negatives raises loudly
    * (AUC undefined).
    *
    * @return one row per bucket, descending score order: (bucket, n_pos,
    *         n_neg, cum_tp, cum_fp, tpr, fpr) plus the constant `auc`. */
  def binnedAuc(
      df: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets >= 2, s"binnedAuc: buckets must be >= 2, got $buckets")
    require(hi > lo, s"binnedAuc: need hi > lo, got [$lo, $hi)")
    val binnedCounts = df
      .select(score.cast("double").as("_s"), label.cast("boolean").as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(least(lit(buckets - 1), greatest(lit(0),
        floor((col("_s") - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo)).cast("int")))
        .as("bucket"))
      .agg(
        sum(when(col("_y"), lit(1L)).otherwise(lit(0L))).as("n_pos"),
        sum(when(col("_y"), lit(0L)).otherwise(lit(1L))).as("n_neg"))
    val bins = df.sparkSession.range(buckets).select(col("id").cast("int").as("bucket"))
    val joined = bins.join(binnedCounts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = joined.agg(sum(col("n_pos")).as("_p"), sum(col("n_neg")).as("_n"))
    val cum = joined
      .withColumn("cum_tp", sum(col("n_pos")).over(wDesc))
      .withColumn("cum_fp", sum(col("n_neg")).over(wDesc))
      // exact per-bucket trapezoid term: fp · (2·cumTP_before + tp)
      .withColumn("_term",
        col("n_neg") * (lit(2L) * (col("cum_tp") - col("n_pos")) + col("n_pos")))
      .crossJoin(broadcast(totals))
      .transform(graft.operators.Pin.lazyPin)
    def pos = when(col("_p") > 0L, col("_p")).otherwise(
      raise_error(lit("binnedAuc: need at least one positive and one negative")))
    def neg = when(col("_n") > 0L, col("_n")).otherwise(
      raise_error(lit("binnedAuc: need at least one positive and one negative")))
    val auc = cum.agg(
      (sum(col("_term")).cast("double") /
        (lit(2L) * first(pos) * first(neg)).cast("double")).as("auc"))
    cum
      .select(col("bucket"), col("n_pos"), col("n_neg"), col("cum_tp"), col("cum_fp"),
        (col("cum_tp").cast("double") / pos.cast("double")).as("tpr"),
        (col("cum_fp").cast("double") / neg.cast("double")).as("fpr"))
      .crossJoin(broadcast(auc))
      .orderBy(col("bucket").desc)
  }

  /** Chi-square independence test between two categorical columns — the
    * profiling check for suspicious correlation between corpus facets
    * (source × language, split × label): observed cell counts vs the
    * independence expectation e = rowTotal * colTotal / n, with
    *
    *   chi2 = Σ_cells (o - e)² / e
    *
    * over the cells of the OBSERVED table (absent combinations have
    * o = 0 and contribute e — their contribution rides the closed form
    * Σ o²/e - n, so no dense cross-join of the category spaces is ever
    * materialized: chi2 = Σ_observed o²/e - n exactly). Per-cell
    * contributions and the total are exact-rational until one division
    * each, rounded to integer NANO units (round(x·10⁹) → BIGINT) and
    * long-summed — order-independent and bit-identical cross-engine. The
    * shipped `e_n9` and `chi2_n9` are BIGINT, never DECIMAL or raw
    * doubles: those are the two physical output types different runtimes
    * RENDER differently even at identical values (the r9 driver-gate
    * lesson). The o²/e nano terms cap the corpus at ~9·10⁹ rows
    * (Σ o²/e ≈ n, ×10⁹ must stay under int64); past that the guard
    * riding `chi2_n9` refuses loudly instead of wrapping. NULL
    * categories form their own level (a missing facet is still a facet).
    *
    * Scale shape: one hash aggregation for the cells, two tiny marginal
    * re-aggregations of those cells (already at most |r|×|c| rows),
    * broadcast back. The input never shuffles twice.
    *
    * @return one row per observed cell: (r, c, o, e_n9, contrib_n9) plus
    *         the constant `chi2_n9` and `dof`, ordered by (r, c). */
  def chiSquare(df: DataFrame, rowCat: Column, colCat: Column): DataFrame = {
    // lazy-pin the cell table: marginals, totals, AND the output all hang
    // off this subtree — without the pin each reference re-runs the corpus
    // scan + count shuffle (4 scans of a 100 TB input instead of 1); the
    // pinned frame is at most |r|×|c| rows
    val cells = df
      .groupBy(rowCat.cast("string").as("r"), colCat.cast("string").as("c"))
      .agg(count(lit(1)).as("o"))
      .transform(graft.operators.Pin.lazyPin)
    val rowTot = cells.groupBy(col("r")).agg(sum(col("o")).as("_rt"))
    val colTot = cells.groupBy(col("c")).agg(sum(col("o")).as("_ct"))
    // level counts come from the marginal frames (one row per level,
    // NULL included) — countDistinct would silently drop a NULL level
    val n = rowTot.agg(sum(col("_rt")).as("_n"), count(lit(1)).as("_nr"))
      .crossJoin(colTot.agg(count(lit(1)).as("_nc")))
    val e = (col("_rt") * col("_ct")).cast("double") / col("_n").cast("double")
    // null-SAFE marginal joins: a NULL level is a real level, and a
    // null-unsafe key would silently drop its cells (and their o-mass
    // from chi2)
    val withE = cells
      .join(broadcast(rowTot.withColumnRenamed("r", "_rj")), col("r") <=> col("_rj"))
      .join(broadcast(colTot.withColumnRenamed("c", "_cj")), col("c") <=> col("_cj"))
      .drop("_rj", "_cj")
      .crossJoin(broadcast(n))
      .withColumn("_e", e) // raw double only INTERNALLY, for the divisions
      .withColumn("e_n9", round(col("_e") * lit(1e9)).cast("long"))
      .withColumn("contrib_n9",
        round((col("o") - col("_e")) * (col("o") - col("_e")) / col("_e") * lit(1e9))
          .cast("long"))
      // closed-form absent-cell correction: Σ_observed o²/e - n adds the
      // e-mass of every zero cell without materializing it
      .withColumn("_chi_term_n9",
        round(col("o").cast("double") * col("o").cast("double") / col("_e") * lit(1e9))
          .cast("long"))
    val stat = withE.agg(
      // int64 horizon: Σ o²/e = n + chi2 ≤ n·min(r,c) (chi2 ≤ n·(min(r,c)−1)),
      // so the nano sum stays exact only while n·min(r,c) ≲ 9·10⁹ — guarding
      // n alone would let an associated table wrap silently. Belt-and-braces:
      // a wrapped long sum makes Σ_chi_term_n9 < n·1e9 (chi2 ≥ 0), so that is
      // raised on too. Guard MULTIPLIED into the output so column pruning can
      // never drop it — the ksDrift lesson.
      (when(first(col("_n")) * least(first(col("_nr")), first(col("_nc"))) <= lit(9000000000L)
          && sum(col("_chi_term_n9")) >= first(col("_n")) * lit(1000000000L), lit(1L))
        .otherwise(raise_error(concat(lit("chiSquare: n*min(r,c) = "),
          (first(col("_n")) * least(first(col("_nr")), first(col("_nc")))).cast("string"),
          lit(" exceeds the 1e-9 fixed-point horizon (9e9) or the nano sum wrapped; " +
            "re-render at a coarser scale"))).cast("long")) *
        (sum(col("_chi_term_n9")) - first(col("_n")) * lit(1000000000L))).as("chi2_n9"),
      ((first(col("_nr")) - 1) * (first(col("_nc")) - 1)).cast("long").as("dof"))
    withE
      .select(col("r"), col("c"), col("o"), col("e_n9"), col("contrib_n9"))
      .crossJoin(broadcast(stat))
      .orderBy(col("r"), col("c"))
  }

  /** One-pass frame profile — the dataset-card generator: one row per
    * input column with its dtype, null count, exact distinct count, and
    * min/max (rendered as strings for a uniform schema). Complex-typed
    * columns (array/map/struct) profile nulls only — they have no
    * portable ordering or cheap distinct.
    *
    * All statistics ride ONE aggregation pass (every stat is another
    * aggregate expression over the same scan). The exact countDistinct
    * expands the aggregate input |atomic columns|-fold — acceptable for
    * a profile run; at 100 TB swap in `approx_count_distinct`, which
    * drops the expand while keeping the single pass. String renderings
    * of doubles differ between engines — profile exact-rendered types
    * (integers, strings, booleans, timestamps) when hash-comparing
    * cross-engine.
    */
  def profileFrame(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val fields = df.schema.fields
    require(fields.nonEmpty, "profileFrame: input has no columns")
    require(fields.map(_.name).distinct.length == fields.length,
      s"profileFrame: duplicate column names in ${fields.map(_.name).toSeq}")
    // backquote every generated lookup: a legal column named "a.b" would
    // otherwise parse as a struct-field path and fail resolution; embedded
    // backticks escape by doubling
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    def isComplex(f: org.apache.spark.sql.types.StructField) = f.dataType match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    }
    val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("_n"))
    fields.foreach { f =>
      val c = q(f.name)
      aggs += sum(when(c.isNull, lit(1L)).otherwise(lit(0L))).as(s"_null_${f.name}")
      if (!isComplex(f)) {
        aggs += countDistinct(c).as(s"_nd_${f.name}")
        aggs += min(c).cast("string").as(s"_min_${f.name}")
        aggs += max(c).cast("string").as(s"_max_${f.name}")
      }
    }
    df.agg(aggs.head, aggs.tail.toSeq: _*)
      .select(explode(array(fields.map { f =>
        struct(
          lit(f.name).as("column"),
          lit(f.dataType.simpleString).as("dtype"),
          col("_n").as("n_rows"),
          q(s"_null_${f.name}").as("n_nulls"),
          (if (isComplex(f)) lit(null).cast("long") else q(s"_nd_${f.name}"))
            .as("n_distinct"),
          (if (isComplex(f)) lit(null).cast("string") else q(s"_min_${f.name}"))
            .as("min_value"),
          (if (isComplex(f)) lit(null).cast("string") else q(s"_max_${f.name}"))
            .as("max_value"))
      }.toIndexedSeq: _*)).as("p"))
      .select(col("p.column"), col("p.dtype"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
      .orderBy(col("column"))
  }

  /** Column-level profile drift between two frame snapshots — the
    * schema/quality regression check run between corpus releases:
    * which columns appeared/vanished, changed dtype, or shifted their
    * null rate or distinct cardinality. The dataset-card DIFF next to
    * [[profileFrame]]'s card.
    *
    * Null rates ship as exact ppm integers (n_nulls·10⁶ div n_rows —
    * truncating integer division, identical cross-engine); dtypes are
    * Spark's simpleString names; columns present on one side only
    * surface with a NULL other side (full-outer on column name), never
    * silently dropped. Every output column is BIGINT/string/boolean.
    *
    * Scale shape: ONE aggregation pass per snapshot (every stat an
    * aggregate expression over the same scan — the profileFrame shape,
    * without its min/max renderings), then a |columns|-row join.
    * The exact countDistinct expands the aggregate input; swap
    * approx_count_distinct in at 100 TB as with profileFrame.
    *
    * @return one row per column name in either snapshot: (column,
    *         dtype_a, dtype_b, type_changed, n_rows_a, n_rows_b,
    *         null_ppm_a, null_ppm_b, null_ppm_delta, n_distinct_a,
    *         n_distinct_b), ordered by column */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    def lean(df: DataFrame, side: String): DataFrame = {
      val fields = df.schema.fields
      require(fields.nonEmpty, "schemaDrift: input has no columns")
      require(fields.map(_.name).distinct.length == fields.length,
        s"schemaDrift: duplicate column names in ${fields.map(_.name).toSeq}")
      def q(name: String) = col("`" + name.replace("`", "``") + "`")
      def isComplex(f: org.apache.spark.sql.types.StructField) = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      }
      val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("_n"))
      fields.foreach { f =>
        val c = q(f.name)
        aggs += sum(when(c.isNull, lit(1L)).otherwise(lit(0L))).as(s"_null_${f.name}")
        if (!isComplex(f)) aggs += countDistinct(c).as(s"_nd_${f.name}")
      }
      df.agg(aggs.head, aggs.tail.toSeq: _*)
        .select(explode(array(fields.map { f =>
          struct(
            lit(f.name).as("column"),
            lit(f.dataType.simpleString).as(s"dtype_$side"),
            col("_n").as(s"n_rows_$side"),
            q(s"_null_${f.name}").as(s"_nulls_$side"),
            (if (isComplex(f)) lit(null).cast("long") else q(s"_nd_${f.name}"))
              .as(s"n_distinct_$side"))
        }.toIndexedSeq: _*)).as("p"))
        .select(col("p.*"))
    }
    lean(a, "a").join(lean(b, "b"), Seq("column"), "full_outer")
      .withColumn("null_ppm_a", expr("(_nulls_a * 1000000L) div n_rows_a"))
      .withColumn("null_ppm_b", expr("(_nulls_b * 1000000L) div n_rows_b"))
      .select(col("column"), col("dtype_a"), col("dtype_b"),
        (!(col("dtype_a") <=> col("dtype_b"))).as("type_changed"),
        col("n_rows_a"), col("n_rows_b"),
        col("null_ppm_a"), col("null_ppm_b"),
        (coalesce(col("null_ppm_b"), lit(0L)) - coalesce(col("null_ppm_a"), lit(0L)))
          .as("null_ppm_delta"),
        col("n_distinct_a"), col("n_distinct_b"))
      .orderBy(col("column"))
  }

  /** Classifier confusion matrix with per-cell recall share — the
    * accuracy report for heuristic labelers (language-ID vs labeled
    * lang, quality gate vs human rating): one row per observed
    * (actual, predicted) cell with its count and the share of the actual
    * class it represents (`recall_frac`; the diagonal cell's share IS
    * that class's recall). NULL levels are real levels, as in
    * [[chiSquare]].
    *
    * Scale shape: one hash aggregation over the input (cells lazily
    * pinned, at most |classes|² rows), one tiny re-aggregation for the
    * actual-class totals, broadcast back null-safely. One exact division.
    */
  def confusionMatrix(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val cells = df
      .groupBy(actual.cast("string").as("actual"), predicted.cast("string").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.operators.Pin.lazyPin)
    val rowTot = cells.groupBy(col("actual")).agg(sum(col("n")).as("_at"))
    cells
      .join(broadcast(rowTot.withColumnRenamed("actual", "_aj")), col("actual") <=> col("_aj"))
      .drop("_aj")
      .select(col("actual"), col("predicted"), col("n"),
        (col("n").cast("double") / col("_at").cast("double")).as("recall_frac"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Calibration (reliability) report for a scored binary outcome:
    * equal-width score bins on [lo, hi) (out-of-range clamped into the
    * edge bins, the [[psiDrift]] binning), each with its count, positive
    * count, observed positive rate, and exact mean score — the
    * "predicted vs observed" table behind a reliability diagram, the
    * standard check before gating a corpus on a quality model's score.
    *
    * One map-side-combined aggregation; rows with NULL score or label
    * are excluded (they calibrate nothing). Mean scores are decimal-
    * exact sums with one trailing division — order-independent and
    * bit-identical cross-engine.
    */
  def calibrationReport(
      df: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets >= 2, s"calibrationReport: buckets must be >= 2, got $buckets")
    require(hi > lo, s"calibrationReport: need hi > lo, got [$lo, $hi)")
    df
      .select(score.cast("double").as("_s"), label.cast("boolean").as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(least(lit(buckets - 1), greatest(lit(0),
        floor((col("_s") - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo)).cast("int")))
        .as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_y").cast("long")).as("n_pos"),
        // round-then-decimal-sum, the psiDrift contrib pattern: a raw
        // DECIMAL cast rounds half-up in Spark vs half-even in DuckDB
        (sum(round(col("_s"), 9).cast("decimal(28,9)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_score"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n").cast("double"))
      .orderBy(col("bucket"))
  }

  /** Score-monotonicity audit — does the label rate actually RISE with
    * the score? The ranking-sanity companion to [[calibrationReport]]
    * (which checks absolute calibration): a quality score whose decile
    * positive-rates are non-monotone is mis-ranking even if its mean is
    * calibrated. Rows are cut into `buckets` equal-population score
    * bands (ties share a band by construction — a tie-heavy distribution
    * therefore yields FEWER than `buckets` rows, never a split tie),
    * each band reports its exact positive-rate in BIGINT nanos, and
    * `is_violation` marks a band whose rate drops below its
    * predecessor's.
    *
    * Scale shape (the paretoFrontier staircase pattern): ONE map-side-
    * combined aggregate keyed by the score value, then cumulative
    * counts over the |distinct score| staircase (single-partition
    * window over THAT aggregate only — quantize continuous scores
    * upstream, e.g. floor(x*100)), then a |buckets|-row rollup. The
    * corpus never sees a global sort or window.
    *
    * @return (bucket, n, n_pos, pos_rate_n9, is_violation) ordered. */
  def monotonicityAudit(
      df: DataFrame, score: Column, label: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"monotonicityAudit: buckets must be >= 2, got $buckets")
    val w = org.apache.spark.sql.expressions.Window
    val perScore = df
      .select(score.cast("long").as("_s"), label.cast("boolean").as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_n"), sum(col("_y").cast("long")).as("_np"))
    val staged = perScore
      .withColumn("_cum", sum(col("_n")).over(
        w.orderBy(col("_s")).rowsBetween(w.unboundedPreceding, w.currentRow)))
      .withColumn("_total", sum(col("_n")).over(w.partitionBy()))
      // the whole VALUE group lands in one band: band of its last row
      .withColumn("bucket", expr(s"((_cum - 1L) * ${buckets}L) div _total"))
    val banded = staged
      .groupBy(col("bucket"))
      .agg(sum(col("_n")).as("n"), sum(col("_np")).as("n_pos"))
      .withColumn("pos_rate_n9", expr("(n_pos * 1000000000L) div n"))
    banded
      .withColumn("is_violation",
        coalesce(col("pos_rate_n9") <
          lag(col("pos_rate_n9"), 1).over(w.orderBy(col("bucket"))), lit(false)))
      .orderBy(col("bucket"))
  }

  /** Per-group rate with Wilson score interval — the "error rate with
    * uncertainty" report (annotation QA, per-source defect rates, A/B
    * gate readouts): for each group, the success share p̂ = k/n and the
    * Wilson 95% bounds
    *
    *   (p̂ + z²/2n ± z·sqrt(p̂(1-p̂)/n + z²/4n²)) / (1 + z²/n)
    *
    * with z = 1.96 literal. Every step — including sqrt — is an
    * exactly-rounded IEEE op over exact inputs in a fixed association
    * order, so the bounds are bit-identical cross-engine with no
    * rounding discipline (the Wald interval's well-known n·p̂ > 5
    * fragility is why Wilson is the default here). NULL predicates count
    * as failures (same posture as [[expectationReport]]).
    *
    * Scale shape: ONE map-side-combined aggregation; groups-row output.
    *
    * @return one row per group: (group, n, k, rate, lo, hi), ordered */
  def rateWithWilson(df: DataFrame, group: Column, success: Column): DataFrame = {
    val z = lit(1.96)
    val agg = df
      .groupBy(group.cast("string").as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(coalesce(success, lit(false)), lit(1L)).otherwise(lit(0L))).as("k"))
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val z2 = z * z
    val center = p + z2 / (lit(2.0) * n)
    val half = z * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * (n * n)))
    val denom = lit(1.0) + z2 / n
    agg
      .withColumn("rate", p)
      .withColumn("lo", greatest(lit(0.0), (center - half) / denom))
      .withColumn("hi", least(lit(1.0), (center + half) / denom))
      .orderBy(col("group"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelings of the same rows (two annotators, or a heuristic labeler
    * vs gold labels — the standard label-quality gate before training on
    * annotated data):
    *
    *   kappa = (po - pe) / (1 - pe),
    *   po = agree / n,   pe = Σ_k rowTotal_k * colTotal_k / n²
    *
    * Every division is a single exactly-rounded IEEE op over exact
    * integers in a fixed association order — bit-identical cross-engine
    * with NO rounding discipline needed (contrast [[chiSquare]], whose
    * per-cell divisions force the decimal path). NULL is a real level on
    * both sides (null-safe agreement), mirroring [[confusionMatrix]].
    * kappa is NULL when pe = 1 (a single level on both sides — chance
    * agreement is total and the statistic is undefined).
    *
    * Scale shape: ONE hash aggregation over the input (cells lazily
    * pinned, at most |levels|² rows); marginals, the pe product sum, and
    * po are all re-aggregations of those cells. The input never shuffles
    * twice. The n² and Σ rt·ct terms are BIGINT-exact up to n ≈ 3·10⁹
    * rows; past that, cast the marginals to DECIMAL(38,0) before the
    * products (kept BIGINT here because the oracle contract needs the
    * cheaper type and label audits run on samples, not the raw corpus).
    *
    * @return one row: (n, agree, po, pe, kappa) */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df
      .groupBy(a.cast("string").as("_a"), b.cast("string").as("_b"))
      .agg(count(lit(1)).as("o"))
      .transform(graft.operators.Pin.lazyPin)
    val rowTot = cells.groupBy(col("_a")).agg(sum(col("o")).as("_rt"))
    val colTot = cells.groupBy(col("_b")).agg(sum(col("o")).as("_ct"))
    val agg = cells.agg(
      sum(col("o")).as("n"),
      sum(when(col("_a") <=> col("_b"), col("o")).otherwise(lit(0L))).as("agree"))
    // pe numerator: Σ rt_k * ct_k over levels present on BOTH sides (a
    // level missing from one margin contributes a zero product). Exact
    // BIGINT arithmetic; the null-safe key keeps NULL a real level.
    val peNum = rowTot
      .join(colTot, col("_a") <=> col("_b"))
      .agg(coalesce(sum(col("_rt") * col("_ct")), lit(0L)).as("_pe_num"))
    agg.crossJoin(broadcast(peNum))
      .withColumn("po", col("agree").cast("double") / col("n").cast("double"))
      .withColumn("pe",
        col("_pe_num").cast("double") / (col("n") * col("n")).cast("double"))
      .withColumn("kappa",
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .select(col("n"), col("agree"), col("po"), col("pe"), col("kappa"))
  }

  /** Fleiss' kappa — chance-corrected agreement among a FIXED number n of
    * raters per item (Fleiss 1971, "Measuring nominal scale agreement
    * among many raters"), the many-rater generalization of [[cohenKappa]]
    * (two labelings) and the categorical sibling of
    * [[krippendorffAlpha]]: the multi-annotator label-quality gate ("do
    * my 5 crowdworkers per example actually agree?") run before training
    * on majority-vote labels.
    *
    * Exact-integer formulation (the reason this hashes bit-identically
    * cross-engine): with n_ij = ratings of item i in category j,
    * N = items, c_j = Σ_i n_ij,
    *
    *   P-bar  = (Σ n_ij² − N·n) / (N·n·(n−1))      — one division,
    *   P-bar_e = Σ_j c_j² / (N·n)²                 — one division,
    *   kappa  = (P-bar − P-bar_e) / (1 − P-bar_e)  — NULL when P-bar_e=1,
    *
    * so every sum is a BIGINT (no order-dependent double accumulation)
    * and each statistic is a single exactly-rounded IEEE op chain. BIGINT
    * horizon: Σ c_j² ≤ (N·n)², exact up to N·n ≈ 3·10⁹ ratings (the
    * [[cohenKappa]] discipline — agreement audits run on samples).
    *
    * Items whose rating count ≠ n are EXCLUDED (Fleiss is undefined for
    * ragged panels — pre-shape with a per-item top-n or use
    * [[krippendorffAlpha]], which handles missingness); NULL categories
    * are a real level, NULL items are excluded with the ragged items.
    *
    * Scale shape: ONE hash aggregation to (item, category) cells, a
    * per-item re-aggregation for the count gate, then 1-row and
    * |categories|-row re-aggregations — the input never shuffles twice
    * and nothing driver-side exceeds one row.
    *
    * @return one row: (n_items, n_raters, p_bar, p_e, kappa) */
  def fleissKappa(df: DataFrame, item: Column, category: Column, n: Int): DataFrame = {
    require(n >= 2, s"fleissKappa: n raters per item must be >= 2, got $n")
    val cells = df
      .filter(item.isNotNull)
      .groupBy(item.cast("string").as("_i"), category.cast("string").as("_c"))
      .agg(count(lit(1)).as("o"))
      .transform(graft.operators.Pin.lazyPin)
    val keep = cells.groupBy(col("_i")).agg(sum(col("o")).as("_it"))
      .filter(col("_it") === n.toLong).select(col("_i"))
    val kc = cells.join(keep, Seq("_i"))
    val s = kc.agg(
      coalesce(sum(col("o") * col("o")), lit(0L)).as("_s2"),
      coalesce(sum(col("o")), lit(0L)).as("_total"))
    val c2 = kc.groupBy(col("_c")).agg(sum(col("o")).as("_cj"))
      .agg(coalesce(sum(col("_cj") * col("_cj")), lit(0L)).as("_c2"))
    val total = col("_total")
    s.crossJoin(broadcast(c2))
      .withColumn("n_items", (total / n.toLong).cast("long"))
      .withColumn("n_raters", lit(n.toLong))
      .withColumn("p_bar",
        when(total > 0L, (col("_s2") - total).cast("double") /
          (total * lit((n - 1).toLong)).cast("double")))
      .withColumn("p_e",
        when(total > 0L, col("_c2").cast("double") / (total * total).cast("double")))
      .withColumn("kappa",
        when(col("p_e") < 1.0, (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))))
      .select(col("n_items"), col("n_raters"), col("p_bar"), col("p_e"), col("kappa"))
  }

  /** Per-class precision / recall / F1 with supports — the standard
    * classifier report over (actual, predicted) labelings, one row per
    * class in the UNION of both level sets (a predicted-only class shows
    * support 0; an actual-only class shows n_pred 0 — both real failure
    * shapes a symmetric report must surface). NULL is a real level.
    *
    * precision = tp/n_pred, recall = tp/support, f1 = 2·p·r/(p+r) — all
    * single-chain exactly-rounded IEEE ops over exact integers in a
    * fixed association order (bit-identical cross-engine, no rounding
    * discipline); each is NULL where its denominator is 0. Macro
    * averages are the caller's one-line aggregation away — kept out of
    * the output so the row shape stays uniform.
    *
    * Scale shape: ONE hash aggregation to cells (lazily pinned, at most
    * |levels|² rows); marginals and true-positives are re-aggregations
    * of those cells joined back null-safely.
    *
    * @return (class, support, n_pred, tp, precision, recall, f1),
    *         ordered by class */
  def classificationReport(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val cells = df
      .groupBy(actual.cast("string").as("_a"), predicted.cast("string").as("_p"))
      .agg(count(lit(1)).as("o"))
      .transform(graft.operators.Pin.lazyPin)
    val actTot = cells.groupBy(col("_a")).agg(sum(col("o")).as("support"))
    val predTot = cells.groupBy(col("_p")).agg(sum(col("o")).as("n_pred"))
    val tp = cells.filter(col("_a") <=> col("_p"))
      .select(col("_a").as("_c"), col("o").as("tp"))
    val classes = actTot
      .join(predTot, col("_a") <=> col("_p"), "full_outer")
      .select(coalesce(col("_a"), col("_p")).as("class"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
    val p = when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred").cast("double"))
    val r = when(col("support") > 0, col("tp").cast("double") / col("support").cast("double"))
    classes
      .join(broadcast(tp), col("class") <=> col("_c"), "left")
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .select(col("class"), col("support"), col("n_pred"), col("tp"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("class"))
  }

  /** Per-group label-balance diagnostics — the class-skew check run
    * before sampling or loss-weighting a labeled corpus: for each group,
    * the label count, Shannon entropy (nats) and Gini impurity of the
    * label distribution.
    *
    *   entropy_n9 = Σ_labels round(-p ln p · 10⁹)   (long-summed nanos)
    *   gini_n9    = 10⁹ - Σ_labels round(p² · 10⁹)  (exact integers)
    *
    * p = c/n is an exact rational (identical doubles on any engine); the
    * ln rides the round-to-nano-then-long-sum discipline and the shipped
    * columns are BIGINT end to end (no DECIMAL and no raw double ships —
    * the r6→r9 oracle lesson: DECIMAL is rendered differently by
    * different runtimes even at identical values). NULL labels form a
    * real level; NULL groups form a real group.
    *
    * Scale shape: one hash aggregation to (group, label) cells, one
    * re-aggregation per group sharing the same shuffle key prefix — at
    * most |groups|·|labels| intermediate rows.
    *
    * @return one row per group: (group, n, n_labels, entropy_n9,
    *         gini_n9), ordered by group */
  def labelBalance(df: DataFrame, group: Column, label: Column): DataFrame = {
    val cells = df
      .groupBy(group.cast("string").as("group"), label.cast("string").as("_l"))
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy(col("group")).agg(sum(col("c")).as("_n"))
    val p = col("c").cast("double") / col("_n").cast("double")
    cells
      .join(broadcast(tot.withColumnRenamed("group", "_gj")), col("group") <=> col("_gj"))
      .drop("_gj")
      .withColumn("_h_n9", round(-p * log(p) * lit(1e9)).cast("long"))
      .withColumn("_g_n9", round(p * p * lit(1e9)).cast("long"))
      .groupBy(col("group"))
      .agg(
        first(col("_n")).as("n"),
        count(lit(1)).as("n_labels"),
        sum(col("_h_n9")).as("entropy_n9"),
        (lit(1000000000L) - sum(col("_g_n9"))).as("gini_n9"))
      .orderBy(col("group"))
  }

  /** Benford first-digit audit — the classic fabricated-numbers /
    * truncated-extract tripwire for financial-style magnitude columns:
    * naturally-occurring multi-order-of-magnitude amounts follow
    * P(d) = log10(1 + 1/d); synthetic, capped, or copy-pasted data
    * doesn't. Run it on amounts BEFORE trusting a new source's numbers.
    *
    * Pure integer arithmetic end to end: the leading digit comes from
    * the exact integer→string rendering (no log10 at runtime), the
    * Benford shares are FIXED nano-unit constants (the only
    * transcendental is baked into the table below at review time), and
    * the per-digit deviation |o·10⁹ − n·share_n9| and total-variation
    * distance tv_n9 = Σ dev div 2n are exact BIGINT ops — bit-identical
    * cross-engine with no rounding discipline at all. Int64 horizon:
    * Σ_d dev_n9 ≤ 2n·10⁹ caps n at 4.5·10⁹ rows (the SUM, not the
    * per-row product, is the binding constraint — Spark long sums wrap
    * silently); the guard rides every derived output column (the
    * ksDrift pruning lesson). Gate rule of thumb: tv_n9 ≲ 1e8
    * (TV < 0.1) looks Benford; ≫ that, investigate.
    *
    * Scale shape: one map-side-combined count to 9 rows, a broadcast
    * grid join — the input never shuffles by value.
    *
    * @param c integer-valued magnitude column (pre-scale doubles with
    *          floor(x·100) cents upstream); nulls and zeros drop, signs
    *          fold
    * @return one row per digit 1..9: (digit, o, share_n9, dev_n9) plus
    *         the constant n and tv_n9, ordered by digit */
  def benfordAudit(df: DataFrame, c: Column): DataFrame = {
    // round(log10(1 + 1/d) * 1e9) — reviewed constants, not runtime libm
    val shareCase = "CASE digit WHEN 1 THEN 301029996L WHEN 2 THEN 176091259L " +
      "WHEN 3 THEN 124938737L WHEN 4 THEN 96910013L WHEN 5 THEN 79181246L " +
      "WHEN 6 THEN 66946790L WHEN 7 THEN 57991947L WHEN 8 THEN 51152522L " +
      "ELSE 45757491L END"
    val counts = df
      .select(abs(c.cast("long")).as("_v"))
      .filter(col("_v").isNotNull && col("_v") > 0L)
      .select(substring(col("_v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("o"))
      // the ≤9-row count table feeds BOTH the total and the grid join:
      // pin it or each reference re-runs the full input scan
      .transform(graft.operators.Pin.lazyPin)
    val tot = counts.agg(coalesce(sum(col("o")), lit(0L)).as("n"))
    val grid = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(tot))
      .withColumn("share_n9", expr(shareCase))
      .withColumn("_guard",
        when(col("n") <= lit(4500000000L), lit(1L))
          .otherwise(raise_error(concat(lit("benfordAudit: "), col("n").cast("string"),
            lit(" rows exceeds the 1e-9 fixed-point horizon (4.5e9: " +
              "the dev sum reaches 2n*1e9); pre-aggregate or sample"))).cast("long")))
      .withColumn("dev_n9",
        col("_guard") * abs(col("o") * lit(1000000000L) - col("n") * col("share_n9")))
    // integer div, NOT `/` (long / long is a double divide in Spark);
    // n = 0 (empty input) yields a NULL tv over an all-zero grid
    val tv = grid.agg(sum(col("dev_n9")).as("_s"), first(col("n")).as("_n"))
      .select(expr("_s div (2 * _n)").as("tv_n9"))
    grid
      .select(col("digit"), col("o"), col("share_n9"), col("dev_n9"), col("n"))
      .crossJoin(broadcast(tv))
      .orderBy(col("digit"))
  }

  /** Referential-integrity audit — the FK contract check behind every
    * join the pipeline trusts: how many child rows reference a parent
    * key that does not exist (orphans silently vanish from inner joins
    * and null-pad outer ones — both wrong answers, neither loud), plus
    * the NULL-FK mass that can never match.
    *
    * Engine parity: exact BIGINTs; the orphan count is a broadcast-able
    * anti-join semantics expressed as a left join against the DISTINCT
    * parent key set (one |parents|-bounded frame).
    *
    * Scale shape: the child scans once; the parent collapses to its
    * distinct key (map-side combined) before the join.
    *
    * @return one row: (n_child_rows, n_null_fk, n_orphans, intact) */
  def referentialIntegrity(
      child: DataFrame, fk: Column,
      parent: DataFrame, pk: Column): DataFrame = {
    val keys = parent.select(pk.as("_pk")).filter(col("_pk").isNotNull).distinct()
      .withColumn("_present", lit(1))
    child.select(fk.as("_fk"))
      .join(keys, col("_fk") === col("_pk"), "left")
      .agg(
        count(lit(1)).as("n_child_rows"),
        coalesce(sum(when(col("_fk").isNull, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("n_null_fk"),
        coalesce(sum(when(col("_fk").isNotNull && col("_present").isNull, lit(1L))
          .otherwise(lit(0L))), lit(0L)).as("n_orphans"))
      .withColumn("intact", col("n_orphans") === 0L)
  }

  /** k-anonymity audit — the re-identification check run before a
    * dataset with quasi-identifier columns leaves the curation pipeline
    * (Sweeney 2002): a release is k-anonymous when every distinct
    * quasi-identifier combination covers at least k rows; any smaller
    * equivalence class singles real records out. Reports the class
    * structure and the violating mass — the decision inputs for
    * generalize/suppress — not the fix itself.
    *
    * Engine parity: exact BIGINTs from one multiplicity aggregation.
    * NULL is a real quasi-identifier value (two NULL-city rows are in
    * the same equivalence class; dropping them would HIDE violators).
    *
    * Scale shape: one map-side-combined aggregation to the class table,
    * one total rollup.
    *
    * @param quasi the quasi-identifier columns (the attacker's join key)
    * @return one row: (n_rows, n_classes, min_class_size,
    *         n_classes_below_k, n_rows_below_k, k_anonymous) */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity: need at least one quasi-identifier column")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    val classes = df
      .groupBy(quasi.zipWithIndex.map { case (c, i) => c.as(s"_q$i") }: _*)
      .agg(count(lit(1)).as("c"))
    classes.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("c")).as("min_class_size"),
      coalesce(sum(when(col("c") < k, lit(1L)).otherwise(lit(0L))), lit(0L))
        .as("n_classes_below_k"),
      coalesce(sum(when(col("c") < k, col("c")).otherwise(lit(0L))), lit(0L))
        .as("n_rows_below_k"))
      .withColumn("k_anonymous", col("min_class_size") >= k)
  }

  /** l-diversity audit — [[kAnonymity]]'s necessary companion (Machanavajjhala
    * et al. 2007): a class can be k-anonymous and still leak when every
    * one of its rows shares the SAME sensitive value (the homogeneity
    * attack — "all 5 patients in that class have cancer"). Reports the
    * minimum distinct-sensitive-value count over equivalence classes and
    * the violating mass at the given l.
    *
    * Engine parity: exact BIGINTs from a two-level aggregation sharing
    * the class-key prefix. NULL quasi values form real classes; NULL
    * sensitive values count as one distinct value.
    *
    * @return one row: (n_rows, n_classes, min_distinct_sensitive,
    *         n_classes_below_l, n_rows_below_l, l_diverse) */
  def lDiversity(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
      l: Long,
  ): DataFrame = {
    require(quasi.nonEmpty, "lDiversity: need at least one quasi-identifier column")
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    val qCols = quasi.zipWithIndex.map { case (c, i) => c.as(s"_q$i") }
    val cells = df
      .groupBy((qCols :+ sensitive.as("_s")): _*)
      .agg(count(lit(1)).as("c"))
    val classes = cells
      .groupBy(cells.columns.dropRight(2).map(col): _*)
      .agg(sum(col("c")).as("n"), count(lit(1)).as("d"))
    classes.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("d")).as("min_distinct_sensitive"),
      coalesce(sum(when(col("d") < l, lit(1L)).otherwise(lit(0L))), lit(0L))
        .as("n_classes_below_l"),
      coalesce(sum(when(col("d") < l, col("n")).otherwise(lit(0L))), lit(0L))
        .as("n_rows_below_l"))
      .withColumn("l_diverse", col("min_distinct_sensitive") >= l)
  }

  /** t-closeness audit (categorical) — the third privacy check after
    * [[kAnonymity]] and [[lDiversity]] (Li et al. 2007): an equivalence
    * class leaks when its sensitive-value DISTRIBUTION differs too much
    * from the table's global one (a class can be diverse and still be
    * 90% cancer against a 1% base rate — the skewness attack). For a
    * categorical sensitive attribute the distance is total variation:
    *
    *   tvd(class) = ½ Σ_s |n_cs/n_c − N_s/N|
    *
    * carried as the EXACT integer numerator Σ_s |n_cs·N − N_s·n_c| over
    * the common denominator (the wassersteinDrift cross-multiplication
    * discipline), so `tvd` is one int→double division chain —
    * bit-identical cross-engine. Absent (class, value) pairs contribute
    * their full global mass (the grid is materialized against the
    * |values|-bounded broadcast value set).
    *
    * Scale shape: one (class, sensitive) aggregation, one class rollup
    * sharing the key prefix, a |values|-bounded broadcast grid join.
    *
    * @return one row per class: (class key columns, n, tvd_num, tvd),
    *         ordered by the class key columns */
  def tCloseness(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
  ): DataFrame = {
    require(quasi.nonEmpty, "tCloseness: need at least one quasi-identifier column")
    val qNames = quasi.indices.map(i => s"q$i")
    val qCols = quasi.zip(qNames).map { case (c, n) => c.as(n) }
    val cells = df
      .groupBy((qCols :+ sensitive.cast("string").as("_s")): _*)
      .agg(count(lit(1)).as("n_cs"))
      .transform(graft.operators.Pin.lazyPin)
    val classes = cells.groupBy(qNames.map(col): _*).agg(sum(col("n_cs")).as("n_c"))
    val globals = cells.groupBy(col("_s")).agg(sum(col("n_cs")).as("n_s"))
      .transform(graft.operators.Pin.lazyPin)
    val total = globals.agg(sum(col("n_s")).as("_n"))
    // null-safe grid join: a NULL quasi value is a REAL class (the
    // kAnonymity convention) — an equi-join would silently zero its
    // cell counts and fabricate a maximal tvd
    val cellsA = cells.select(
      (qNames.map(n => col(n).as(s"_ce_$n")) :+ col("_s").as("_ce_s") :+ col("n_cs")): _*)
    val joinCond = (qNames.map(n => col(n) <=> col(s"_ce_$n")) :+
      (col("_s") <=> col("_ce_s"))).reduce(_ && _)
    val grid = classes
      .crossJoin(broadcast(globals))
      .join(cellsA, joinCond, "left")
      .crossJoin(broadcast(total))
      .withColumn("n_cs", coalesce(col("n_cs"), lit(0L)))
    grid
      .groupBy((qNames.map(col) :+ col("n_c") :+ col("_n")): _*)
      .agg(sum(abs(col("n_cs") * col("_n") - col("n_s") * col("n_c"))).as("tvd_num"))
      .select((qNames.map(col) :+ col("n_c").as("n") :+ col("tvd_num") :+
        (col("tvd_num").cast("double") /
          (lit(2.0) * col("n_c").cast("double") * col("_n").cast("double")))
          .as("tvd")): _*)
      .orderBy(qNames.map(col): _*)
  }

  /** Per-group OLS trend slope over time — "is this metric drifting up
    * or down, and how fast" — in the same exact-integer moment
    * discipline as [[pearsonCorr]]: x is the event time quantized to
    * MINUTES RELATIVE TO THE GROUP'S OWN FIRST EVENT (centering keeps
    * Σx² inside int64 for spans up to centuries; raw epoch seconds
    * squared would overflow), y is the caller's pre-quantized integral
    * metric.
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)    [y-units/minute]
    *
    * Both sides of the division ship as exact BIGINTs (`slope_num`,
    * `slope_den`, DECIMAL-widened then int64-guarded) plus the one-IEEE
    * -division `slope`; NULL slope when all events share a minute.
    *
    * Scale shape: one min-aggregation for the group epoch, one
    * co-keyed join back, one moment aggregation — three hash exchanges
    * on the same group key (AQE reuses the partitioning).
    *
    * @return (group, n, slope_num, slope_den, slope) ordered by group */
  def groupTrend(
      df: DataFrame,
      group: Column,
      ts: Column,
      y: Column,
  ): DataFrame = {
    val base = df
      .select(group.as("group"), unix_micros(ts.cast("timestamp")).as("_us"),
        y.cast("long").as("_y"))
      .filter(col("group").isNotNull && col("_us").isNotNull && col("_y").isNotNull)
    val t0 = base.groupBy(col("group")).agg(min(col("_us")).as("_us0"))
    val xy = base.join(t0, Seq("group"))
      .withColumn("_x", expr("(_us - _us0) div 60000000L"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    def guarded(c: Column, what: String) =
      when(abs(c) <= lit(Long.MaxValue), c.cast("long"))
        .otherwise(raise_error(lit(
          s"groupTrend: $what exceeds the int64 horizon — quantize coarser"))
          .cast("long"))
    xy.groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        guarded(sum(dec(col("_x"))), "sum(x)").as("_sx"),
        guarded(sum(dec(col("_y"))), "sum(y)").as("_sy"),
        guarded(sum(dec(col("_x")) * dec(col("_x"))), "sum(x^2)").as("_sxx"),
        guarded(sum(dec(col("_x")) * dec(col("_y"))), "sum(x*y)").as("_sxy"))
      .select(col("group"), col("n"),
        guarded(dec(col("n")) * dec(col("_sxy")) - dec(col("_sx")) * dec(col("_sy")),
          "slope numerator").as("slope_num"),
        guarded(dec(col("n")) * dec(col("_sxx")) - dec(col("_sx")) * dec(col("_sx")),
          "slope denominator").as("slope_den"))
      .withColumn("slope",
        when(col("slope_den") > 0L,
          col("slope_num").cast("double") / col("slope_den").cast("double")))
      .orderBy(col("group"))
  }

  /** Deterministic Pearson correlation over pre-quantized INTEGRAL
    * columns — what Spark's built-in `corr` cannot promise: the float
    * aggregator sums partial moments in shuffle order, so two runs (or
    * an AQE re-plan) can disagree in the last ulps. Here the five
    * moments (Σx, Σy, Σx², Σy², Σxy) are EXACT integers (per-row
    * products widen through DECIMAL(38,0) so they cannot wrap; the sums
    * are guarded back into int64 with a loud error past the horizon),
    * and the correlation is one fixed-association IEEE chain over their
    * exact long→double conversions:
    *
    *   corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̄) · √(n·Σy² − Σy²̄))
    *
    * NULL when either variance is zero. Quantize upstream (e.g.
    * `floor(price)`, `floor(discount·100)`) — the [[graft.operators.Preference.groupAdvantage]]
    * fixed-point contract.
    *
    * Scale shape: ONE map-side-combined total aggregation; nothing else.
    *
    * @return one row: (n, sum_x, sum_y, sum_xy, corr) */
  def pearsonCorr(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("long").as("_x"), y.cast("long").as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum(dec(col("_x"))).as("_sx"),
      sum(dec(col("_y"))).as("_sy"),
      sum(dec(col("_x")) * dec(col("_x"))).as("_sxx"),
      sum(dec(col("_y")) * dec(col("_y"))).as("_syy"),
      sum(dec(col("_x")) * dec(col("_y"))).as("_sxy"))
    // exact-int accumulators must fit int64: long→double is correctly
    // rounded on every engine, decimal→double is not (the r6 red-row
    // vector) — refuse loudly instead of shipping an unportable value
    def guarded(c: Column, what: String) =
      when(abs(c) <= lit(Long.MaxValue), c.cast("long"))
        .otherwise(raise_error(lit(
          s"pearsonCorr: $what exceeds the int64 horizon — quantize coarser"))
          .cast("long"))
    val g = agg.select(
      col("n"),
      guarded(col("_sx"), "sum(x)").as("sum_x"),
      guarded(col("_sy"), "sum(y)").as("sum_y"),
      guarded(col("_sxx"), "sum(x^2)").as("_sxx"),
      guarded(col("_syy"), "sum(y^2)").as("_syy"),
      guarded(col("_sxy"), "sum(x*y)").as("sum_xy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nD * d("sum_xy") - d("sum_x") * d("sum_y")
    val vx = nD * d("_sxx") - d("sum_x") * d("sum_x")
    val vy = nD * d("_syy") - d("sum_y") * d("sum_y")
    g.select(col("n"), col("sum_x"), col("sum_y"), col("sum_xy"),
      when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy))).as("corr"))
  }

  /** Fused multi-pair Pearson audit (r15): several (x, y) correlations of
    * the SAME table in ONE scan + ONE aggregation instead of one full
    * scan per pair. Value-identical to calling [[pearsonCorr]] per pair
    * and unioning: the accumulators are exact DECIMAL sums
    * (order-independent), the per-pair null filter becomes the matching
    * conditional aggregate (same addend set), and the final double
    * arithmetic is the same expression tree per row. One row per pair,
    * labelled, in the given order.
    *
    * @return (pair, n, sum_x, sum_y, sum_xy, corr) */
  def pearsonCorrPairs(
      df: DataFrame,
      pairs: Seq[(String, Column, Column)]): DataFrame = {
    require(pairs.nonEmpty, "pearsonCorrPairs: at least one (label, x, y) pair")
    def dec(c: Column) = c.cast("decimal(19,0)")
    val aggCols = pairs.zipWithIndex.flatMap { case ((_, x, y), i) =>
      val xl = x.cast("long"); val yl = y.cast("long")
      val live = xl.isNotNull && yl.isNotNull
      def s(v: Column, name: String) = sum(when(live, v)).as(s"${name}_$i")
      Seq(
        count(when(live, lit(1))).as(s"n_$i"),
        s(dec(xl), "_sx"), s(dec(yl), "_sy"),
        s(dec(xl) * dec(xl), "_sxx"), s(dec(yl) * dec(yl), "_syy"),
        s(dec(xl) * dec(yl), "_sxy"))
    }
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    def guarded(c: Column, what: String) =
      when(abs(c) <= lit(Long.MaxValue), c.cast("long"))
        .otherwise(raise_error(lit(
          s"pearsonCorr: $what exceeds the int64 horizon — quantize coarser"))
          .cast("long"))
    val rows = pairs.zipWithIndex.map { case ((label, _, _), i) =>
      // the guard expression is verbatim pearsonCorr's, so edge behavior
      // (including its zero-live-row path) matches the per-pair calls
      val n = col(s"n_$i")
      val sx = guarded(col(s"_sx_$i"), "sum(x)")
      val sy = guarded(col(s"_sy_$i"), "sum(y)")
      val sxx = guarded(col(s"_sxx_$i"), "sum(x^2)")
      val syy = guarded(col(s"_syy_$i"), "sum(y^2)")
      val sxy = guarded(col(s"_sxy_$i"), "sum(x*y)")
      struct(lit(label).as("pair"), n.as("n"), sx.as("sum_x"), sy.as("sum_y"),
        sxy.as("sum_xy"), sxx.as("_sxx"), syy.as("_syy"))
    }
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nD * d("sum_xy") - d("sum_x") * d("sum_y")
    val vx = nD * d("_sxx") - d("sum_x") * d("sum_x")
    val vy = nD * d("_syy") - d("sum_y") * d("sum_y")
    agg
      .select(explode(array(rows: _*)).as("_p"))
      .select(col("_p.*"))
      .select(col("pair"), col("n"), col("sum_x"), col("sum_y"), col("sum_xy"),
        when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy))).as("corr"))
  }

  /** Primary-key audit — the uniqueness/nullability contract check run
    * before a column is trusted as a join or dedup key: row and distinct
    * counts, NULL keys (which match nothing in an equi-join), duplicated
    * keys, the worst multiplicity, and the excess-row count a
    * dedup-by-key would remove. One row out.
    *
    * Engine parity: every column is an exact BIGINT from one
    * aggregation chain. Scale shape: one map-side-combined aggregation
    * to the key-multiplicity table, one total rollup; NULL keys are
    * counted from the same pass (no second scan).
    *
    * @return one row: (n_rows, n_null_keys, n_keys, n_dup_keys,
    *         max_multiplicity, n_excess_rows) */
  def keyAudit(df: DataFrame, key: Column): DataFrame = {
    // No pin: the multiplicity table has exactly ONE consumer (the rollup
    // below), so a localCheckpoint only added a full materialization of
    // |distinct keys| rows to block storage for nothing (r14 measured:
    // dq_key_audit 2.27 s -> the rollup reads the agg exchange directly).
    val mult = df
      .select(key.as("_k"))
      .groupBy(col("_k")).agg(count(lit(1)).as("c"))
    mult.agg(
      sum(col("c")).as("n_rows"),
      coalesce(sum(when(col("_k").isNull, col("c")).otherwise(lit(0L))), lit(0L))
        .as("n_null_keys"),
      count(when(col("_k").isNotNull, lit(1))).as("n_keys"),
      coalesce(sum(when(col("_k").isNotNull && col("c") > 1L, lit(1L))
        .otherwise(lit(0L))), lit(0L)).as("n_dup_keys"),
      coalesce(max(when(col("_k").isNotNull, col("c"))), lit(0L))
        .as("max_multiplicity"),
      coalesce(sum(when(col("_k").isNotNull && col("c") > 1L, col("c") - 1L)
        .otherwise(lit(0L))), lit(0L)).as("n_excess_rows"))
  }

  /** Robust per-group outlier report — median/MAD instead of mean/std,
    * so a heavy tail cannot drag its own detection threshold (the
    * standard robust-statistics objection to z-scores): a value is an
    * outlier when |x - median| > k · MAD, MAD = median(|x - median|).
    *
    * Engine parity: medians are the proven percentile/quantile_cont
    * linear interpolation over identical doubles (the txt_ppl_buckets
    * contract); deviations, the k·MAD threshold and the comparison are
    * fixed-association exactly-rounded IEEE ops; counters are exact
    * BIGINTs. A group where >50% of values tie (MAD = 0) flags every
    * value off the median — the degenerate case every MAD treatment
    * shares; it is deterministic here.
    *
    * Scale shape: two percentile aggregations and one count aggregation,
    * all hash-keyed on the group with the corpus re-shuffling on the
    * SAME key (exchange reuse). CAVEAT — exact percentile state is
    * O(group) on the agg buffer, the price of an exact median; for
    * unbounded groups at 100 TB use [[Sketches.histogramQuantiles]] to
    * pick approximate thresholds instead.
    *
    * @return (group, n, median, mad, n_outliers) ordered by group */
  def robustOutliers(
      df: DataFrame,
      group: Column,
      value: Column,
      k: Double = 3.0,
  ): DataFrame = {
    require(k > 0, s"robustOutliers: k must be > 0, got $k")
    val base = df
      .select(group.as("group"), value.cast("double").as("_v"))
      .filter(col("group").isNotNull && col("_v").isNotNull)
    val med = base.groupBy(col("group"))
      .agg(percentile(col("_v"), lit(0.5)).as("median"))
    val dev = base.join(med, Seq("group"))
      .withColumn("_dev", abs(col("_v") - col("median")))
    dev
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        first(col("median")).as("median"),
        percentile(col("_dev"), lit(0.5)).as("mad"))
      .join(dev.select(col("group"), col("_dev")), Seq("group"))
      .groupBy(col("group"))
      .agg(
        first(col("n")).as("n"),
        first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(col("_dev") > lit(k) * col("mad"), lit(1L)).otherwise(lit(0L)))
          .as("n_outliers"))
      .orderBy(col("group"))
  }

  /** Krippendorff's alpha (nominal) — the multi-annotator agreement
    * coefficient that, unlike [[cohenKappa]], handles any number of
    * annotators and missing ratings (Krippendorff 2004). Over ratings
    * (unit, annotator, label), using only units with m_u >= 2 ratings:
    *
    *   alpha = 1 - (n-1) · Σ_u (m_u² - Σ_c m_uc²)/(m_u - 1) / (n² - Σ_c n_c²)
    *
    * where m_uc counts label c in unit u, m_u = Σ_c m_uc, n_c = Σ_u m_uc
    * and n = Σ_u m_u — the coincidence-matrix form with the per-unit
    * pair weighting folded in. The annotator identity only establishes
    * one-rating-per-slot; duplicate (unit, annotator) rows are collapsed
    * to their min label first so a double-logged rating cannot inflate m_u.
    *
    * Determinism contract: the per-unit disagreement weight 1/(m_u - 1)
    * is carried in micro-unit fixed point via integer division
    * (`x * 1e6 div (m_u - 1)` — truncation identical on every engine, the
    * picorank discipline), so `alpha_fp` is a BIGINT end to end: no
    * double ever enters an aggregation and no decimal→double conversion
    * ships. (n-1)·U must fit a BIGINT: n <= ~3e6 pairable ratings at the
    * 1e-6 alpha resolution — guarded with a loud error; beyond that,
    * re-render at a coarser Scale (the bound is resolution·n², not
    * corpus size).
    *
    * Scale shape: ONE hash aggregation of the rating corpus to
    * (unit, label) cells, a per-unit re-aggregation sharing the same
    * shuffle-key prefix, then two scalar totals — the label-marginal
    * frame is |labels|-bounded and the final assembly is a cross join of
    * three one-row frames.
    *
    * @return one row: (n_units, n_ratings, n_labels, do_fp, de_fp,
    *         alpha_fp) — do/de in 1e-6 units of disagreement-per-pairable
    *         -value, alpha_fp = 1e6 · alpha truncated */
  /** EXACT order statistics WITHOUT a global sort — distributed
    * selection: the q-th percentile as the element of rank
    * (n−1)·q div 100 + 1 (discrete, no interpolation — the
    * quantile_disc contract). Spark's exact `percentile` buffers every
    * value of the aggregation in memory (per-group sorted array —
    * dead at corpus scale) and `approx_percentile` is inexact by
    * design; this is the third point: exact AND bounded.
    *
    * Shape (the [[graft.operators.Curation.exactSample]] selection
    * machinery, on values instead of hashes): one min/max/count pass;
    * integer range-bucketing into <= 65537 buckets; one
    * map-side-combined histogram whose rows cumulate on the driver to
    * locate each target rank's bucket; then ONLY the needed buckets
    * (~n/65536 rows each) pay a per-bucket sort to resolve the local
    * offset. Three corpus scans, zero corpus-wide sorts.
    *
    * Value concentration (round-12, verdict r11 item 7): a needed bucket
    * holding more than `maxSortRows` rows does NOT hit the per-bucket
    * sort — it recurses: re-bucket the bucket's own value range, locate
    * the sub-bucket, and either answer directly (a sub-range whose
    * min == max IS the answer — the degenerate 90%-one-value corpus
    * resolves here with no sort at all) or sort the now-~n/65536²-bounded
    * slice. Per-level sorts are thus bounded by max(maxSortRows, n/2³²).
    *
    * Overflow hygiene (ADVICE r11): bucketing is `floorDiv(v, width) -
    * floorDiv(lo, width)` — never `v - lo`, which silently wraps when
    * the value range spans more than Long.MaxValue (full-range 64-bit
    * hash columns); the width itself is computed through BigInt.
    *
    * @param percents percent ranks in [0, 100]
    * @return (q, n, rank, value), ordered by q */
  def exactQuantiles(
      df: DataFrame,
      value: Column,
      percents: Seq[Int],
      maxSortRows: Long = 1L << 20): DataFrame = {
    require(percents.nonEmpty && percents.forall(q => q >= 0 && q <= 100),
      s"exactQuantiles: percents must be in [0, 100], got $percents")
    require(maxSortRows >= 1L, s"exactQuantiles: maxSortRows must be >= 1, got $maxSortRows")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
    val stats = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).collect()(0)
    val n = stats.getLong(0)
    if (n == 0L)
      return Seq.empty[(Int, Long, Long, Long)].toDF("q", "n", "rank", "value")
    val lo = stats.getLong(1)
    val hi = stats.getLong(2)
    val qs = percents.distinct.sorted
    if (lo == hi) // constant column: every quantile IS that value, no jobs
      return qs.map(q => (q, n, Math.floorDiv((n - 1) * q, 100L) + 1L, lo))
        .toDF("q", "n", "rank", "value")
    val (bucketed, hist) = rangeHistogram(vals, lo, hi)
    // target ranks (1-based), bucket + local offset via the cumulative
    val targets = qs.map { q =>
      val rank = Math.floorDiv((n - 1) * q, 100L) + 1L
      val (bkt, off) = locate(hist, rank)
      (q, rank, bkt, off)
    }
    val counts = hist.toMap
    val (heavy, light) = targets.partition { case (_, _, bkt, _) => counts(bkt) > maxSortRows }
    val lightDf = if (light.isEmpty)
      Seq.empty[(Int, Long, Long, Long)].toDF("q", "n", "rank", "value")
    else {
      val needed = light.map(_._3).distinct
      val targetDf = light.toDF("q", "rank", "_bkt", "_off")
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_bkt")).orderBy(col("v"))
      bucketed
        .filter(col("_bkt").isin(needed: _*))
        .withColumn("_rn", row_number().over(wB).cast("long"))
        .join(broadcast(targetDf), Seq("_bkt"))
        .filter(col("_rn") === col("_off"))
        .select(col("q"), lit(n).as("n"), col("rank"), col("v").as("value"))
    }
    val heavyRows = heavy.map { case (q, rank, bkt, off) =>
      (q, n, rank,
        resolveRank(bucketed.filter(col("_bkt") === bkt).select(col("v")),
          off, maxSortRows, depth = 1))
    }
    lightDf.unionByName(heavyRows.toDF("q", "n", "rank", "value"))
      .orderBy(col("q"))
  }

  /** Overflow-proof <= 65537-bucket range histogram: bucket =
    * floorDiv(v, width) - floorDiv(lo, width) (monotone; never forms
    * v - lo, which wraps on a full-range 64-bit column), width through
    * BigInt. Returns (bucketed frame with `_bkt`, sorted histogram). */
  private def rangeHistogram(
      vals: DataFrame, lo: Long, hi: Long): (DataFrame, Array[(Int, Long)]) = {
    val width = ((BigInt(hi) - BigInt(lo)) / 65536 + 1).toLong
    val base = Math.floorDiv(lo, width)
    // SQL DIV truncates toward zero; the CASE corrects negative operands
    // to floor semantics (matches Math.floorDiv)
    val bucketed = vals.withColumn("_bkt",
      expr(s"CAST((v DIV ${width}L) - (CASE WHEN v < 0 AND v % ${width}L != 0 " +
        s"THEN 1 ELSE 0 END) - ${base}L AS INT)"))
    val hist = bucketed.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    (bucketed, hist)
  }

  private def locate(hist: Array[(Int, Long)], rank: Long): (Int, Long) = {
    var cum = 0L
    var i = 0
    while (i < hist.length) {
      if (cum + hist(i)._2 >= rank) return (hist(i)._1, rank - cum)
      cum += hist(i)._2
      i += 1
    }
    (hist.last._1, hist.last._2) // unreachable for rank <= n; clamp defensively
  }

  /** Resolve the `off`-th smallest value of a single-bucket slice: answer
    * directly when the slice is one repeated value; sort (bounded — the
    * off-th smallest is the max of the first `off` under an orderBy-limit,
    * no single-partition window) when small enough; otherwise re-bucket
    * the slice's own range and recurse into the located sub-bucket. */
  private def resolveRank(
      slice: DataFrame, off: Long, maxSortRows: Long, depth: Int): Long = {
    val st = slice.agg(count(lit(1)), min(col("v")), max(col("v"))).collect()(0)
    val c = st.getLong(0)
    val mn = st.getLong(1)
    val mx = st.getLong(2)
    require(off >= 1 && off <= c, s"resolveRank: offset $off outside slice of $c rows")
    if (mn == mx) mn // concentrated value: the answer, zero sorts
    else if (c <= maxSortRows || depth >= 3) {
      require(off <= Int.MaxValue,
        s"resolveRank: offset $off exceeds the sortable horizon after $depth levels — " +
          "raise maxSortRows or widen the recursion")
      slice.orderBy(col("v")).limit(off.toInt)
        .agg(max(col("v"))).collect()(0).getLong(0)
    } else {
      val (bucketed, hist) = rangeHistogram(slice, mn, mx)
      val (bkt, subOff) = locate(hist, off)
      resolveRank(bucketed.filter(col("_bkt") === bkt).select(col("v")),
        subOff, maxSortRows, depth + 1)
    }
  }

  def krippendorffAlpha(
      df: DataFrame,
      unit: Column,
      annotator: Column,
      label: Column,
  ): DataFrame = {
    val S = 1000000L
    val slots = df
      .select(unit.cast("string").as("_u"), annotator.cast("string").as("_a"),
        label.cast("string").as("_l"))
      .filter(col("_u").isNotNull && col("_a").isNotNull && col("_l").isNotNull)
      .groupBy(col("_u"), col("_a")).agg(min(col("_l")).as("_l"))
    val cells = slots.groupBy(col("_u"), col("_l")).agg(count(lit(1)).as("c"))
    val units = cells.groupBy(col("_u"))
      .agg(sum(col("c")).as("m"), sum(col("c") * col("c")).as("sq"))
      .filter(col("m") >= 2)
    // pairable units only: a single-rating unit contributes no pair, and
    // its labels must not enter the marginals either
    val pairableCells = cells.join(units.select(col("_u")), Seq("_u"), "left_semi")
    val obs = units.agg(
      count(lit(1)).as("n_units"),
      sum(col("m")).as("n"),
      // Σ_u (m_u² - Σ_c m_uc²) · S div (m_u - 1): exact integers, the
      // only division carried in micro fixed point
      sum(expr(s"((m * m - sq) * ${S}L) div (m - 1L)")).as("_u_fp"))
    val marg = pairableCells.groupBy(col("_l")).agg(sum(col("c")).as("nc"))
      .agg(count(lit(1)).as("n_labels"),
        coalesce(sum(col("nc") * col("nc")), lit(0L)).as("_sq_marg"))
    obs.crossJoin(broadcast(marg))
      // (n-1)·U <= n²·S: refuse loudly past the BIGINT horizon instead of
      // wrapping into a silently wrong alpha
      .withColumn("_guard",
        when(col("n") <= lit(3000000L), lit(1L))
          .otherwise(raise_error(concat(lit("krippendorffAlpha: "), col("n").cast("string"),
            lit(" pairable ratings exceeds the 1e-6 fixed-point horizon (3e6); " +
              "re-render at a coarser scale"))).cast("long")))
      .select(
        col("n_units"), col("n").as("n_ratings"), col("n_labels"),
        // _guard (1L, or raise_error past the horizon) rides EVERY output
        // column: a consumer selecting only alpha_fp must still trip the
        // overflow check — column pruning drops unreferenced expressions
        // (the ksDrift lesson, flagged again by the r9 advisor)
        expr(s"_guard * _u_fp div n").as("do_fp"),
        expr(s"_guard * (((n * n - _sq_marg) * ${S}L) div (n * (n - 1L)))").as("de_fp"),
        when(col("n") * col("n") === col("_sq_marg"), lit(null).cast("long"))
          .otherwise(expr(
            s"_guard * (${S}L - (((n - 1L) * _u_fp) div (n * n - _sq_marg)))"))
          .as("alpha_fp"))
  }

  /** Exact Gini coefficient of a non-negative metric — the inequality /
    * concentration measure (token-share across sources, spend across
    * users): `G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx)` over the ascending
    * sort. Computed from the tie-grouped value histogram with integer
    * rank-range sums (a tied group spanning ranks lo..hi contributes
    * `x·cnt·(lo + hi)` to the 2i·x term), so `gini_num` is an exact
    * BIGINT and `gini` is one division over three int64→double
    * conversions — bit-identical cross-engine.
    *
    * Contract: values must be non-negative (Gini is undefined below
    * zero) — a negative minimum raises rather than returning a silently
    * wrong coefficient. NULL values are excluded. Same summary-window
    * shape as [[mannWhitneyU]]: the one ordered window runs over the
    * DISTINCT-value histogram, never the input.
    *
    * @return one row: (n, sum_x, gini_num, gini); gini NULL on an empty
    *         or zero-sum input */
  def giniCoefficient(df: DataFrame, c: Column): DataFrame = {
    val vals = df.select(c.cast("long").as("v")).filter(col("v").isNotNull)
    val hist = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val below = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // Products and sums widen through DECIMAL(38,0) (the HUGEINT
    // discipline, matching DuckDB's native BIGINT-sum widening): long
    // arithmetic would wrap silently at ~2.1M rows tied on one max-long
    // value, breaking the exact-BIGINT contract cross-engine. The final
    // gini_num lands back in BIGINT behind a loud range guard — the same
    // raise-past-the-horizon behavior DuckDB's ::BIGINT cast gives the
    // oracle.
    val agg = hist
      .withColumn("cum", coalesce(sum(col("cnt")).over(below), lit(0L)))
      .agg(
        sum(col("cnt")).as("n"),
        min(col("v")).as("_minv"),
        sum(col("v") * col("cnt")).as("sum_x"),
        sum(col("v").cast("decimal(38,0)") * col("cnt").cast("decimal(38,0)") *
            (lit(2L) * col("cum") + col("cnt") + lit(1L)).cast("decimal(38,0)"))
          .as("_twoix"))
    val guard = when(col("_minv") >= 0L || col("_minv").isNull, lit(1L))
      .otherwise(raise_error(concat(lit("giniCoefficient: negative values (min="),
        col("_minv").cast("string"), lit(") — Gini is undefined"))).cast("long"))
    val giniNumDec = col("_twoix") -
      (col("n") + lit(1L)).cast("decimal(38,0)") * col("sum_x").cast("decimal(38,0)")
    val giniNum = when(col("_twoix").isNull, lit(null).cast("long"))
      .when(abs(giniNumDec) <= lit(Long.MaxValue).cast("decimal(38,0)"),
        giniNumDec.cast("long"))
      .otherwise(raise_error(lit(
        "giniCoefficient: gini_num exceeds the BIGINT horizon — wrap refused")).cast("long"))
    // guard rides EVERY output column (the krippendorffAlpha pruning
    // lesson): a consumer selecting only gini must still trip the check
    agg.select(
      (col("n") * guard).as("n"),
      (col("sum_x") * guard).as("sum_x"),
      (giniNum * guard).as("gini_num"),
      (when(col("n") > 0L && col("sum_x") > 0L,
        giniNum.cast("double") /
          (col("n").cast("double") * col("sum_x").cast("double")))
        * guard.cast("double")).as("gini"))
  }

  /** Exact Mann-Whitney U (Wilcoxon rank-sum) two-sample test with the
    * standard tie-corrected normal approximation — the nonparametric
    * "did this metric's distribution shift between cohorts" answer when
    * means mislead (heavy tails, ordinal scores).
    *
    * Exactness without a pooled per-row rank: U decomposes over the
    * tie-grouped value histogram — for each distinct value v with group
    * counts (n_a, n_b) and the count of B-rows strictly below it,
    * `U1 += n_a·cumB_below + n_a·n_b/2`. Both U statistics are carried
    * DOUBLED (`u1_x2`, `u2_x2`) so the half-credit tie term stays a
    * BIGINT; `u1_x2 + u2_x2 == 2·n1·n2` by construction (spec-checked).
    * The z statistic is fixed-association IEEE arithmetic (+,-,*,/ and
    * one exactly-rounded sqrt) over int64→double conversions — bit-
    * identical cross-engine, no rounding discipline needed. No normal
    * CDF is taken (erf is not portable); consumers compare |z| to their
    * own critical value.
    *
    * Scale shape: one map-side-combined count per (value, side), a full
    * outer merge, then prefix sums over DISTINCT VALUES ordered by value
    * — a single ordered window whose state is the distinct-value
    * histogram, not the input (the [[ksDrift]] summary-window rule).
    * Right for the quantized/ordinal metrics the test is used on; a
    * continuous full-range column should be quantized by the caller
    * (e.g. `floor(x·100)`), exactly as any rank test bins ties.
    *
    * @return one row: (n1, n2, u1_x2, u2_x2, tie_sum, z) where tie_sum =
    *         Σ(t³−t) over tie groups and z is NULL when either side is
    *         empty or the pooled variance degenerates (all values tied) */
  def mannWhitneyU(a: DataFrame, b: DataFrame, c: Column): DataFrame = {
    def hist(df: DataFrame, out: String): DataFrame = df
      .select(c.as("v")).filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as(out))
    val pooled = hist(a, "n_a")
      .join(hist(b, "n_b"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val below = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // U products and the t³ tie term widen through DECIMAL(38,0) (the
    // HUGEINT discipline): ~2.1M rows tied on one value makes t³ exceed
    // 2^63, and Spark long arithmetic wraps silently while DuckDB raises
    // — the exact-BIGINT contract would silently diverge cross-engine.
    // Final statistics land back in BIGINT behind a loud range guard.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val tGroup = dec(col("n_a") + col("n_b"))
    val agg = pooled
      .withColumn("cum_a", coalesce(sum(col("n_a")).over(below), lit(0L)))
      .withColumn("cum_b", coalesce(sum(col("n_b")).over(below), lit(0L)))
      .agg(
        sum(col("n_a")).as("n1"),
        sum(col("n_b")).as("n2"),
        sum(dec(col("n_a")) * dec(lit(2L) * col("cum_b") + col("n_b"))).as("_u1_dec"),
        sum(dec(col("n_b")) * dec(lit(2L) * col("cum_a") + col("n_a"))).as("_u2_dec"),
        sum(tGroup * tGroup * tGroup - tGroup).as("_tie_dec"))
    def toLong(c: Column, what: String): Column =
      when(c.isNull, lit(null).cast("long"))
        .when(abs(c) <= lit(Long.MaxValue).cast("decimal(38,0)"), c.cast("long"))
        .otherwise(raise_error(lit(
          s"mannWhitneyU: $what exceeds the BIGINT horizon — wrap refused")).cast("long"))
    val bounded = agg.select(col("n1"), col("n2"),
      toLong(col("_u1_dec"), "u1_x2").as("u1_x2"),
      toLong(col("_u2_dec"), "u2_x2").as("u2_x2"),
      toLong(col("_tie_dec"), "tie_sum").as("tie_sum"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val nd = (col("n1") + col("n2")).cast("double")
    // association mirrored verbatim by the oracle SQL: any re-parenthesis
    // is a red driver row
    val sigma = sqrt((n1d * n2d / lit(12.0)) *
      ((nd + lit(1.0)) - col("tie_sum").cast("double") / (nd * (nd - lit(1.0)))))
    bounded.select(col("n1"), col("n2"), col("u1_x2"), col("u2_x2"), col("tie_sum"),
      when(col("n1") > 0L && col("n2") > 0L && sigma > lit(0.0),
        (col("u1_x2").cast("double") - n1d * n2d) / (lit(2.0) * sigma)).as("z"))
  }
}
