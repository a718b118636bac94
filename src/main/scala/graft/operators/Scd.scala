package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the versioned-upsert
  * primitive of an iterated corpus/lakehouse pipeline: apply a change
  * batch to a history table while preserving every prior version with
  * its validity interval. The batch counterpart of a MERGE INTO with
  * WHEN MATCHED UPDATE/close + INSERT semantics.
  *
  * Table contract (kept single-payload so the operator is
  * schema-agnostic; wrap multi-column attrs in a struct/json upstream):
  *  - history: (key, value, valid_from, valid_to) — `valid_to` NULL for
  *    the open (current) version; at most ONE open row per key.
  *  - changes: (key, value, ts, op) with op ∈ upsert | delete — at most
  *    one change per key per batch (enforce upstream with a
  *    latest-per-key cut; duplicated keys and unknown ops fail loudly
  *    here). `ts`/`valid_from`/`valid_to` share any one orderable type
  *    (epoch long, timestamp, version number).
  *
  * Merge rules (standard SCD2):
  *  - upsert, no open row        → new open version [ts, NULL)
  *  - upsert, open row, value ≠  → close old at ts + new open version
  *  - upsert, open row, value =  → no-op (null-safe compare)
  *  - delete, open row           → close old at ts
  *  - delete, no open row        → no-op
  *  - closed history rows pass through untouched.
  *
  * Scale shape: closed history never joins (pure pass-through union);
  * the open slice — at most one row per live key — full-outer-joins the
  * change batch on the key (one shuffle, broadcast when the batch is
  * small) and fans out to at most 2 output rows per pair. No windows.
  */
object Scd {

  def scd2Merge(history: DataFrame, changes: DataFrame): DataFrame = {
    val tsType = changes.schema("ts").dataType
    val nullTs = lit(null).cast(tsType)
    val closed = history.filter(col("valid_to").isNotNull)
    // presence marker instead of valid_from.isNotNull: an open row with a
    // NULL valid_from is still an open row — keying existence off a
    // nullable payload column silently dropped such rows
    val open = history.filter(col("valid_to").isNull)
      .select(col("key"), col("value").as("_o_value"), col("valid_from").as("_o_from"),
        lit(true).as("_o_has"))
    val ch = changes.select(col("key"), col("value").as("_c_value"),
      col("ts").as("_c_ts"), col("op").as("_c_op"))
    // both guards must live on a column the merge actually reads, or the
    // optimizer prunes the raise_error away with the unused column
    val dupCount =
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("key")))
    val chGuarded = ch.withColumn("_c_ts",
      when(dupCount > 1, raise_error(concat(
        lit("scd2Merge: multiple changes for key "), col("key").cast("string")))
        .cast(tsType))
        // an unrecognized (or NULL — which would masquerade as "no
        // change" after the outer join) op must not silently act as a
        // delete
        .when(col("_c_op").isNull || !col("_c_op").isin("upsert", "delete"),
          raise_error(concat(
            lit("scd2Merge: unknown op '"), coalesce(col("_c_op"), lit("NULL")),
            lit("' for key "), col("key").cast("string"))).cast(tsType))
        .otherwise(col("_c_ts")))
    val j = open.join(chGuarded, Seq("key"), "full_outer")
    // per pair, up to two rows: the (possibly closed) old version and the
    // (possibly created) new open version
    val oldRow = when(col("_o_has").isNotNull,
      when(col("_c_op").isNull || (col("_c_op") === "upsert" && col("_o_value") <=> col("_c_value")),
        // untouched open row (no change, or no-op upsert)
        struct(col("_o_value").as("value"), col("_o_from").as("valid_from"),
          nullTs.as("valid_to")))
        .otherwise( // closed by an effective upsert or a delete
          struct(col("_o_value").as("value"), col("_o_from").as("valid_from"),
            col("_c_ts").as("valid_to"))))
    val newRow = when(
      col("_c_op") === "upsert" &&
        (col("_o_has").isNull || !(col("_o_value") <=> col("_c_value"))),
      struct(col("_c_value").as("value"), col("_c_ts").as("valid_from"),
        nullTs.as("valid_to")))
    val merged = j
      .select(col("key"), explode(filter(array(oldRow, newRow), _.isNotNull)).as("v"))
      .select(col("key"), col("v.value"), col("v.valid_from"), col("v.valid_to"))
    closed.select(col("key"), col("value"), col("valid_from"), col("valid_to"))
      .unionByName(merged)
  }
}
