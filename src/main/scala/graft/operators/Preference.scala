package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data operators — the RLHF/eval side of a training-data
  * pipeline: turning pairwise comparisons (human ratings, model win/loss
  * records, A/B outcomes) into per-item strength scores and rankings.
  */
object Preference {

  /** Fixed-point scale: strengths are BIGINTs in micro-units (the
    * tdp_graph_rank picorank discipline — integer arithmetic is
    * order-free and bit-identical on every engine; doubles summed in an
    * aggregation are not). */
  val Scale = 1000000L

  /** Bradley-Terry strength fit over pairwise comparisons via the
    * minorize-maximize update (Hunter 2004), run for a FIXED number of
    * iterations in integer fixed-point:
    *
    *   pi'_i = w_i / Sum_j n_ij / (pi_i + pi_j)
    *
    * with w_i = i's total wins and n_ij = matches between i and j. Items
    * with zero wins converge to strength 0 (they lose every matchup the
    * model can express); self-matches and NULL ids are dropped.
    *
    * Determinism contract: strengths are micro-unit BIGINTs; each MM term
    * is one integer division `(n_ij * Scale^2) div (pi_i + pi_j)` and the
    * denominator is an exact BIGINT sum — no double ever enters an
    * aggregation, so the fit replays bit-identically in SQL regardless of
    * aggregation order (the r6/r7 oracle lesson, applied from the start).
    * Division-by-zero guards (`greatest(.., 1)`) only engage for all-zero
    * strength pairs, identically on both engines. n_ij * Scale^2 must fit
    * a BIGINT: at most ~9.2e6 comparisons per PAIR — a cap on repeated
    * matchups between two specific items, not on corpus size.
    *
    * Scale shape: the comparison corpus shuffles ONCE (the two count
    * aggregations); every MM iteration after that is an equi-join on the
    * BOUNDED item-pair graph (|items|^2 at worst, the realized matchup
    * set in practice) — iteration cost is independent of how many raw
    * comparisons were ingested. The final dense_rank is a window over the
    * item set, not the corpus.
    *
    * @param comparisons one row per decided matchup
    * @param winner      winning item id (cast to string)
    * @param loser       losing item id
    * @param iterations  fixed MM iteration count (>= 1)
    * @return (item, wins, n_matches, bt_score_fp, rank) ordered by rank —
    *         bt_score_fp is the micro-unit strength; rank is dense by
    *         (bt_score_fp DESC, item ASC) */
  def bradleyTerry(
      comparisons: DataFrame,
      winner: Column,
      loser: Column,
      iterations: Int = 3,
  ): DataFrame = {
    require(iterations >= 1, s"bradleyTerry: iterations must be >= 1, got $iterations")
    val canon = comparisons
      .select(winner.cast("string").as("w"), loser.cast("string").as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
    // ONE corpus-scale aggregation; everything below is item-scale
    val directed = canon.groupBy(col("w"), col("l")).agg(count(lit(1)).as("c"))
      .transform(graft.operators.Pin.lazyPin)
    val matchups = directed.select(col("w").as("a"), col("l").as("b"), col("c"))
      .unionByName(directed.select(col("l").as("a"), col("w").as("b"), col("c")))
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))
      .transform(graft.operators.Pin.lazyPin)
    val wins = directed.groupBy(col("w").as("item")).agg(sum(col("c")).as("wins"))
    val items = matchups.select(col("a").as("item")).distinct()
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .transform(graft.operators.Pin.lazyPin)

    var pi = items.select(col("item"), lit(Scale).as("pi"))
    for (_ <- 1 to iterations) {
      val denom = matchups
        .join(pi.select(col("item").as("a"), col("pi").as("pi_a")), Seq("a"))
        .join(pi.select(col("item").as("b"), col("pi").as("pi_b")), Seq("b"))
        .select(col("a"),
          // (n * Scale^2) div (pi_a + pi_b): micro-scaled MM term, exact
          expr(s"(n * ${Scale * Scale}L) div greatest(pi_a + pi_b, 1L)").as("term"))
        .groupBy(col("a")).agg(sum(col("term")).as("d"))
      pi = items
        .join(denom.withColumnRenamed("a", "item"), Seq("item"), "left")
        .select(col("item"),
          expr(s"(wins * ${Scale * Scale}L) div greatest(coalesce(d, 0L), 1L)").as("pi"))
        .transform(graft.operators.Pin.lazyPin)
    }
    val byScore = Window.orderBy(col("bt_score_fp").desc, col("item").asc)
    items
      .join(pi, Seq("item"))
      .join(matchups.groupBy(col("a").as("item")).agg(sum(col("n")).as("n_matches")),
        Seq("item"))
      .select(col("item"), col("wins"), col("n_matches"), col("pi").as("bt_score_fp"))
      .withColumn("rank", dense_rank().over(byScore))
      .orderBy(col("rank"), col("item"))
  }

  /** Chosen/rejected pair construction from scored completions — the DPO/
    * RLHF dataset-prep step: per prompt, the best- and worst-scored
    * response with the score margin between them. Selection is a
    * lexicographic struct extreme — (score, response) — so ties break
    * deterministically (equal scores: the max/min response id) with ONE
    * map-side-combined aggregation per prompt, never a per-prompt sort
    * window. Prompts whose best and worst ROWS coincide (a single
    * response, or every row identical) are dropped — a pair with no
    * contrast teaches nothing. Distinct responses with EQUAL scores
    * survive with margin 0 (the deterministic id tie-break picks the
    * pair); filter `margin > 0` before a margin-weighted loss.
    *
    * Engine parity: the extremes are exact value comparisons; margin is
    * one IEEE subtract of identical doubles.
    *
    * @return (prompt, chosen, rejected, chosen_score, rejected_score,
    *         margin) ordered by prompt */
  def chosenRejected(
      responses: DataFrame,
      prompt: Column,
      response: Column,
      score: Column,
  ): DataFrame = {
    val base = responses.select(
      prompt.as("prompt"),
      response.cast("string").as("r"),
      score.cast("double").as("sc"))
      .filter(col("r").isNotNull && col("sc").isNotNull)
    base
      .groupBy(col("prompt"))
      .agg(
        max(struct(col("sc"), col("r"))).as("_best"),
        min(struct(col("sc"), col("r"))).as("_worst"))
      .filter(col("_best") =!= col("_worst"))
      .select(col("prompt"),
        col("_best.r").as("chosen"), col("_worst.r").as("rejected"),
        col("_best.sc").as("chosen_score"), col("_worst.sc").as("rejected_score"),
        (col("_best.sc") - col("_worst.sc")).as("margin"))
      .orderBy(col("prompt"))
  }

  /** Pairwise win-rate report with Wilson 95% bounds — the "is A actually
    * better than B, given how few matchups we have" readout that gates a
    * preference dataset before the [[bradleyTerry]] fit (a 3-0 record is
    * not evidence; the Wilson interval says so). One row per UNORDERED
    * pair, canonicalized so `item_a < item_b`; `rate` is a's win share.
    *
    * Engine parity: counts are exact; rate and the Wilson chain are the
    * [[DataQuality.rateWithWilson]] fixed-association IEEE contract
    * (sqrt is exactly rounded per IEEE 754 — not a transcendental).
    *
    * Scale shape: ONE aggregation of the comparison corpus on the
    * canonical pair key; everything else is a projection. */
  def winRateReport(
      comparisons: DataFrame,
      winner: Column,
      loser: Column,
  ): DataFrame = {
    val canon = comparisons
      .select(winner.cast("string").as("w"), loser.cast("string").as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
      .select(
        least(col("w"), col("l")).as("item_a"),
        greatest(col("w"), col("l")).as("item_b"),
        (col("w") === least(col("w"), col("l"))).as("_a_won"))
    val agg = canon
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_a_won"), lit(1L)).otherwise(lit(0L))).as("wins_a"))
    val z = lit(1.96)
    val n = col("n").cast("double")
    val p = col("wins_a").cast("double") / n
    val z2 = z * z
    val center = p + z2 / (lit(2.0) * n)
    val half = z * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * (n * n)))
    val denom = lit(1.0) + z2 / n
    agg
      .withColumn("rate", p)
      .withColumn("lo", greatest(lit(0.0), (center - half) / denom))
      .withColumn("hi", least(lit(1.0), (center + half) / denom))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** pass@k — the unbiased estimator behind HumanEval-style functional
    * correctness reporting (Chen et al. 2021, eq. 1): for a task with n
    * samples of which c passed,
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i)
    *
    * computed as the right-hand SEQUENTIAL product — a fixed-order IEEE
    * fold over exact small integers (both engines fold left-to-right),
    * so no binomial ever materializes and the value is bit-identical
    * cross-engine. Edge cases: n < k ships NULL (the estimator is
    * undefined — reporting 0 or 1 would silently bias a macro average);
    * n − c < k ships exactly 1.0 (every size-k draw contains a pass).
    *
    * Scale shape: ONE map-side-combined (task) aggregation; the fold
    * runs over a k-element literal sequence per task row.
    *
    * @param samples one row per (task, attempt)
    * @param correct boolean pass signal
    * @param ks      the k values to report (columns `pass_at_<k>`)
    * @return (task, n, c, pass_at_k...) ordered by task */
  def passAtK(
      samples: DataFrame,
      task: Column,
      correct: Column,
      ks: Seq[Int] = Seq(1, 5, 10),
  ): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"passAtK: ks must be >= 1, got $ks")
    val base = samples
      .select(task.as("task"), correct.cast("boolean").as("_ok"))
      .filter(col("task").isNotNull && col("_ok").isNotNull)
      .groupBy(col("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_ok"), lit(1L)).otherwise(lit(0L))).as("c"))
    val nD = col("n").cast("double")
    val cD = col("c").cast("double")
    val withKs = ks.foldLeft(base) { (df, k) =>
      val prod = aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
        (acc, i) => acc * ((nD - cD - i.cast("double")) / (nD - i.cast("double"))))
      df.withColumn(s"pass_at_$k",
        when(col("n") < k, lit(null).cast("double"))
          .when(col("n") - col("c") < k, lit(1.0))
          .otherwise(lit(1.0) - prod))
    }
    withKs.orderBy(col("task"))
  }

  /** GRPO-style group advantage normalization — the RL post-training
    * data-prep step: per prompt group, each sampled completion's reward is
    * centered and scaled by the group's own statistics,
    *
    *   advantage_i = (r_i - mean(r_group)) / std(r_group)
    *
    * (Shao et al. 2024, DeepSeekMath — group-relative policy optimization
    * estimates the baseline from the sample group instead of a critic).
    * Degenerate groups (one sample, or all rewards equal: std = 0) ship
    * advantage 0 — no contrast, no gradient.
    *
    * Determinism contract: `reward` MUST be integral (the picorank /
    * [[bradleyTerry]] fixed-point discipline — quantize upstream, e.g.
    * `floor(score * 1e6)`). Group sums `s = Sum r` and `ss = Sum r^2` are
    * then exact BIGINTs, and every shipped double derives from them via
    * int64→double conversion (correctly rounded IEEE, identical on every
    * engine — unlike a decimal→double re-conversion, the r6 red-row
    * vector) plus fixed-association +,-,*,/ and one exactly-rounded
    * sqrt. No transcendental, no decimal, no rounding contract needed.
    * r^2 per row must fit a BIGINT: |reward| <= ~3e9, a cap on the
    * quantized reward magnitude, not on corpus or group size (the guard
    * raises loudly, it never wraps).
    *
    * Scale shape: ONE map-side-combined aggregation of the corpus on the
    * group key plus one co-partitioned equi-join of the |groups|-bounded
    * stats frame back onto the corpus — both shuffles hash on `group`, so
    * AQE plans the pair as a single exchange reuse. No window, no sort:
    * a per-group sort window would order every completion at 100 TB for
    * statistics that one partial-aggregable pass already yields.
    *
    * @param responses one row per sampled completion
    * @param group     the prompt/group key
    * @param id        completion id (unique within group; output order key)
    * @param reward    integral quantized reward
    * @return (group_id, id, reward_fp, n, mean, std, advantage) ordered by
    *         (group_id, id) */
  def groupAdvantage(
      responses: DataFrame,
      group: Column,
      id: Column,
      reward: Column,
  ): DataFrame = {
    val base = responses.select(
      group.as("group_id"), id.as("id"), reward.cast("long").as("reward_fp"))
      .filter(col("group_id").isNotNull && col("reward_fp").isNotNull)
      // |r| <= 3e9 keeps r*r inside a BIGINT; a wrapped square would
      // silently corrupt the variance, so refuse loudly instead
      .withColumn("reward_fp",
        when(abs(col("reward_fp")) <= lit(3000000000L), col("reward_fp"))
          .otherwise(raise_error(concat(
            lit("groupAdvantage: |reward| "), col("reward_fp").cast("string"),
            lit(" exceeds 3e9 — quantize at a coarser scale")))
            .cast("long")))
    val stats = base
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("reward_fp")).as("_s"),
        sum(col("reward_fp") * col("reward_fp")).as("_ss"))
      .withColumn("mean", col("_s").cast("double") / col("n"))
      .withColumn("_var",
        greatest(col("_ss").cast("double") / col("n") - col("mean") * col("mean"),
          lit(0.0)))
      .withColumn("std", sqrt(col("_var")))
    base
      .join(stats, Seq("group_id"))
      .select(col("group_id"), col("id"), col("reward_fp"), col("n"),
        col("mean"), col("std"),
        when(col("std") > 0.0,
          (col("reward_fp").cast("double") - col("mean")) / col("std"))
          .otherwise(lit(0.0)).as("advantage"))
      .orderBy(col("group_id"), col("id"))
  }
}
