package graft

import graft.fdr.TargetDecoy
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: target-decoy FDR q-values
    * (SURVEY.md §2.4 A14 — the engine's core algorithmic aggregation) over
    * the events table. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("assay", col("user_id") % 8)
      .withColumn("is_decoy", col("event_type") === "error")
    TargetDecoy
      .withQValues(ev, Seq(col("assay")), col("value"), col("is_decoy"), col("event_id"))
      .select(col("assay"), col("event_id"), col("is_decoy"), col("fdr"), col("q_value"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql

  /** Live DuckDB re-derivations for the VALUES-pinned subset of oracleSql
    * — local logic lint only (tools/check_oracle.py), never shipped to the
    * driver gate. See Queries.rederiveSql. */
  def rederiveSql: Map[String, String] = Queries.rederiveSql
}
