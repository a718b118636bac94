package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (the hand-tuned fallbacks when AQE's runtime
  * re-planning isn't enough — e.g. a single hot key inside one assay).
  *
  * The reference's corpus is exactly this shape: per-assay PSM counts vary
  * 815 -> 800,790 (BASELINE.md), and within an assay a handful of proteins
  * can carry most PSMs.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Spreads a hot key over `saltBuckets`
    * reducers. The salt is a deterministic hash of the whole row's unique
    * column — no RNG, so retries/speculative tasks agree.
    *
    * @param uniqueCol any column unique-ish per row (drives salt assignment)
    * @param partials  aggregates computed per (key, salt) — must be
    *                  re-aggregatable (sum/count/min/max style)
    * @param finals    re-aggregation of the partial columns by key
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      uniqueCol: Column,
      saltBuckets: Int,
      partials: Seq[Column],
      finals: Seq[Column],
  ): DataFrame = {
    require(saltBuckets > 0, s"saltedAggregate: saltBuckets must be positive, got $saltBuckets")
    df.withColumn("_salt", pmod(xxhash64(uniqueCol), lit(saltBuckets)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted broadcast-free join for one skewed build side: the probe side
    * gets a deterministic salt in [0, n); the build side is replicated n
    * times with every salt value; the join key becomes (key, salt). Use
    * when the build side is too big to broadcast and one probe key is hot.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeUnique: Column,
      saltBuckets: Int,
  ): DataFrame = {
    require(saltBuckets > 0, s"saltedJoin: saltBuckets must be positive, got $saltBuckets")
    val salted = probe.withColumn("_salt", pmod(xxhash64(probeUnique), lit(saltBuckets)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Exact heavy-hitter report: the k hottest values of `key` with their
    * row counts — the diagnostic that decides WHERE the salting above is
    * needed. Deterministic tie-break (count desc, then key asc). Plan
    * shape at scale: partial aggregation map-side, one exchange on the
    * key, then `TakeOrderedAndProject` (per-partition top-k merged at the
    * driver) — no global sort ever materializes.
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"heavyHitters: k must be positive, got $k")
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)
  }

  /** Fan-out-guarded equi-join — the join-explosion tripwire: at 100 TB
    * an unexpected duplicate key on the build side doesn't produce a
    * wrong answer you notice, it produces 10^12 rows you pay for. This
    * join asserts, AT RUNTIME and inside the same pass, that no right-
    * side key matches more than `maxMatches` rows — one aggregation on
    * the right side computes per-key multiplicity, the guard rides the
    * joined rows as a codegen `raise_error` (a violated contract kills
    * the job with the offending key in the message, instead of melting
    * the shuffle tier).
    *
    * Cost: one extra map-side-combined aggregation of the right side on
    * the SAME join key (the exchange is reused for the join itself) and
    * one BIGINT column through the join — no second pass over the left
    * side, no driver collect.
    *
    * @return left ⋈ right on `key` (inner), all columns of both plus
    *         nothing extra; throws SparkException(USER_RAISED_EXCEPTION)
    *         when ANY right key's multiplicity exceeds `maxMatches` —
    *         matched or not: the guard is evaluated on the right-side
    *         fanout profile BEFORE the join (deliberately stricter than a
    *         matched-only check: an over-fanout build key is a data-
    *         quality defect worth tripping on even when today's probe
    *         side happens not to touch it, and checking pre-join keeps
    *         the guard off the joined row path) */
  def fanoutGuardedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      maxMatches: Long,
  ): DataFrame = {
    require(maxMatches >= 1, s"fanoutGuardedJoin: maxMatches must be >= 1, got $maxMatches")
    val mult = right.groupBy(col(key)).agg(count(lit(1)).as("_fanout"))
    // the guard rides a FILTER, not a projected column — a projected
    // guard that nothing downstream reads is column-pruned unevaluated
    // (the ksDrift lesson); a filter predicate must evaluate per row
    val guarded = right
      .join(mult, Seq(key))
      .filter(
        when(col("_fanout") <= maxMatches, lit(true))
          .otherwise(raise_error(concat(
            lit(s"fanoutGuardedJoin: key "), col(key).cast("string"),
            lit(s" matches "), col("_fanout").cast("string"),
            lit(s" right rows (> $maxMatches) — the join would explode")))
            .cast("boolean")))
      .drop("_fanout")
    left.join(guarded, Seq(key))
  }
}
