package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup pattern of
  * a continuously-ingesting pipeline: keep a small per-key STATE table
  * whose columns are mergeable (associative + commutative) partial
  * aggregates, fold each new batch into it, and render user-facing
  * metrics from state alone. Reprocessing cost per batch is O(batch),
  * never O(history).
  *
  * State columns: (key, n, sum_dec, min_v, max_v). Sums are carried as
  * DECIMAL(38,9) (9-dp-rounded inputs sum-widened to full precision, and
  * both aggState and mergeStates pin that type explicitly so a consumer
  * persisting state gets a stable schema) — exact, so merge order (batch
  * arrival order, partition
  * layout, engine) cannot change a single bit of the result, and
  * incrementally-maintained state is PROVABLY identical to a full
  * recompute (the oracle checks exactly that). Distinct-count state
  * composes the same way via the bounded
  * [[graft.functions.KmvSketchAgg]] buffer when needed.
  *
  * Scale shape: one hash aggregation per batch (map-side combined), one
  * key-partitioned merge aggregation over (state ∪ batch-state) — both
  * sides already one-row-per-key.
  */
object Incremental {

  private val stateCols = Seq("key", "n", "sum_dec", "min_v", "max_v")

  /** Per-key mergeable state from a raw batch. NULL values contribute to
    * no aggregate (a key with only NULL values reports n = 0 and NULL
    * sum/min/max — present, but metric-less). */
  def aggState(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(
        count(value).as("n"),
        // round-then-decimal: a raw double->DECIMAL cast rounds half-up
        // in Spark vs half-even in DuckDB at 9-dp halfway points (the
        // calibrationReport parity note) -- round() agrees on both
        sum(round(value, 9).cast("decimal(28,9)")).cast("decimal(38,9)").as("sum_dec"),
        min(value).as("min_v"),
        max(value).as("max_v"))

  /** Merge state tables (any number ≥ 1, any order — the columns are
    * associative/commutative by construction). */
  def mergeStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeStates: need at least one state table")
    states.foreach { s =>
      require(stateCols.forall(s.columns.contains),
        s"mergeStates: state table must have columns $stateCols, got ${s.columns.toSeq}")
    }
    states.map(_.select(stateCols.map(col): _*)).reduce(_ unionByName _)
      .groupBy(col("key"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_dec")).cast("decimal(38,9)").as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** User-facing metrics rendered from state alone: exact sum (one
    * decimal→double conversion) and mean (one division). */
  def stateMetrics(state: DataFrame): DataFrame =
    state.select(
      col("key"), col("n"),
      col("sum_dec").cast("double").as("sum_v"),
      when(col("n") > 0, col("sum_dec").cast("double") / col("n").cast("double"))
        .as("mean_v"),
      col("min_v"), col("max_v"))

  /** Apply a CDC changelog to a snapshot — the upsert/delete merge that
    * keeps a materialized table current from a change stream (the batch
    * half of a Debezium/Delta-MERGE shape). Each change row carries a
    * key, a monotone version (LSN / commit ts), an op in
    * {'I','U','D'} and the new payload; the result is the snapshot with,
    * per key, the HIGHEST-versioned change applied: I/U upserts the
    * payload, D deletes the key. Keys untouched by the changelog pass
    * through unchanged.
    *
    * Late/duplicate delivery is absorbed by the champion semantics: only
    * the (version, op) lexicographic maximum per key wins, so replaying
    * a batch — or applying two overlapping batches in either order — is
    * idempotent. Ties on version break deterministically by op then
    * payload (exact value comparison; at-least-once streams should make
    * versions unique upstream).
    *
    * Scale shape: ONE map-side-combined champion aggregation collapses
    * the changelog to a row per touched key (batch-sized, typically ≪
    * snapshot), then ONE full-outer equi-join on the key applies it —
    * the snapshot is never sorted and never shuffles more than once; a
    * small batch broadcast-joins under AQE.
    *
    * @param snapshot current table: key + `valueCols`
    * @param changes  changelog: key, version, op, + `valueCols`
    * @param valueCols payload column names present in BOTH frames
    * @return the new snapshot (key + valueCols), ordered by key */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      key: Column,
      version: Column,
      op: Column,
      valueCols: Seq[String],
  ): DataFrame = {
    require(valueCols.nonEmpty, "applyChangelog: need at least one payload column")
    val canonOp = upper(op.cast("string"))
    val guardedOp = when(canonOp.isin("I", "U", "D"), canonOp)
      .otherwise(raise_error(concat(
        lit("applyChangelog: unknown op '"), coalesce(canonOp, lit("NULL")),
        lit("' — expected I/U/D"))))
    // champion change per key: lexicographic (version, op, payload) max —
    // one aggregation, no per-key sort window
    val winner = changes
      .select((key.as("_k") +: version.as("_v") +: guardedOp.as("_op") +:
        valueCols.map(col)): _*)
      .filter(col("_k").isNotNull && col("_v").isNotNull)
      .groupBy(col("_k"))
      .agg(max(struct((col("_v") +: col("_op") +: valueCols.map(col)): _*)).as("_w"))
      .select(col("_k"), col("_w._op").as("_op"),
        struct(valueCols.map(c => col(s"_w.$c").as(c)): _*).as("_payload"))
    val snap = snapshot.select((key.as("_k") +: valueCols.map(col)): _*)
    snap
      .join(winner, Seq("_k"), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col("_k").as("key") +: valueCols.map(c =>
        when(col("_op").isNotNull, col(s"_payload.$c")).otherwise(col(c)).as(c)): _*)
      .orderBy(col("key"))
  }
}
