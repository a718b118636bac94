package graft

import graft.fdr.TargetDecoy
import graft.functions.{PeptideFunctions, TextFunctions, UsiFunctions}
import graft.operators.{Dedup, Similarity, SpectraCluster}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The driver-checked operator inventory (SURVEY.md §2): each entry is one
  * operator family expressed over the shared testdata tables, with an ANSI
  * SQL oracle the driver replays in DuckDB.
  *
  * Query keys carry the SURVEY §2 operator ids they exercise. Conventions
  * for oracle hash-parity:
  *  - every result is deterministically ordered by a unique key, in both
  *    engines;
  *  - double aggregates over non-integral values go through DECIMAL casts
  *    (exact summation, order-independent) and back to double;
  *  - derived doubles use only IEEE ops in the same association order on
  *    both sides (divisions, sequential list folds), so values are
  *    bit-identical;
  *  - hashes are md5-based (portable across engines).
  */
object Queries {

  /** SURVEY.md §2 operator registry, assembled from the per-family
    * registry objects ([[QueriesReference]], [[QueriesDedupSim]],
    * [[QueriesTextCuration]], [[QueriesEventsQuality]] — round-11
    * maintainability split; keys and semantics unchanged, families are
    * key-disjoint by construction). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesReference.queries ++ QueriesDedupSim.queries ++
      QueriesTextCuration.queries ++ QueriesEventsQuality.queries

  /** DuckDB oracle SQL per query key (driver-replayed). */
  val oracleSql: Map[String, String] =
    QueriesReference.oracleSql ++ QueriesDedupSim.oracleSql ++
      QueriesTextCuration.oracleSql ++ QueriesEventsQuality.oracleSql

  /** Live re-derivations for the VALUES-pinned oracles (see
    * [[PinnedOracles]] and tools/check_oracle.py). */
  val rederiveSql: Map[String, String] =
    QueriesReference.rederiveSql ++ QueriesDedupSim.rederiveSql ++
      QueriesTextCuration.rederiveSql ++ QueriesEventsQuality.rederiveSql
}
