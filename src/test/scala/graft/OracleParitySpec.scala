package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-portability lint — the codified round-6 lesson.
  *
  * Four driver rows (`dq_chi_square`, `tdp_graph_rank`, `tdp_psi_drift`,
  * `txt_vocab_drift`) went hash-red in round 6 while replaying
  * bit-identically on the build machine: their outputs carried raw DOUBLE
  * columns whose value is RE-COMPUTED independently by the oracle engine
  * through libm (`ln`/`pow`) or through a decimal→double re-conversion —
  * both of which different DuckDB builds round differently in the last
  * ulp. The parity discipline (documented at the top of Queries.scala)
  * is: a floating-point output column must be either (a) exactly-rounded
  * IEEE arithmetic (+,-,*,/) over identical inputs in the same
  * association order, or (b) `round(expr, <=9)`-ed on BOTH engines
  * before it ships; sums of non-integral values ship as DECIMAL, never
  * re-converted to DOUBLE.
  *
  * This spec enforces the discipline structurally over the live
  * registry, so a new query cannot silently reintroduce the fragility:
  *
  *  1. FORBIDDEN, no allowlist: an oracle that decimal-sums and then
  *     re-converts to DOUBLE (`sum(x)::DOUBLE` where `x` is declared via
  *     `::DECIMAL(..) AS x` in the same statement) — the exact pattern
  *     behind all three sum-total reds.
  *  2. AUDITED: a query whose oracle applies a transcendental
  *     (`ln`/`log*`/`exp`/`pow`) AND whose Spark output schema contains
  *     a DOUBLE/FLOAT column must appear in the audit table below with
  *     the reason the column is portable (in practice: it is
  *     `round(..., <=9)`-ed on both engines before shipping). Queries
  *     whose transcendental feeds only DECIMAL contributions need no
  *     entry.
  */
class OracleParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val transcendental =
    "(?i)\\b(ln|log|log10|log2|log1p|exp|pow|power)\\s*\\(".r
  private def isValuesPin(sql: String) =
    sql.trim.toUpperCase.startsWith("SELECT * FROM (VALUES")

  /** query -> (double columns allowed, why each is environment-proof). */
  private val audited: Map[String, String] = Map(
    "p12_score_transform" ->
      "score doubles are DecimalFormat/round-rendered before output on both engines",
    "tdp_temperature_mixture" ->
      "weights/draws are round(pow-share, 9)-ed on both engines before shipping",
    "tdp_temperature_plan" ->
      "plan shares are round(pow-share, 9)-ed on both engines",
    "txt_bm25_topk" ->
      "bm25 score is round(.., 6)-ed on both engines before the ranking cut",
    "txt_lm_score" ->
      "per-doc mean nll is round(.., 6)-ed on both engines",
    "txt_lm_score_fx" ->
      "fixture twin of txt_lm_score; same round(.., 6) contract",
    "txt_lr_train" ->
      "weights are integer-quantized gradient accumulations rendered at fixed scale",
    "txt_pmi_bigrams" ->
      "pmi is round(ln-ratio, 6)-ed on both engines (driver-green since r5)",
    "txt_retrieval_metrics" ->
      "mrr/recall_k are single exact divisions of integers; the log2 feeds only decimal gains",
    "txt_retrieval_metrics_fx" ->
      "fixture twin of txt_retrieval_metrics; same contract",
    "txt_rank_correlation" ->
      ("rho is one multiply+division over exact integers; the ln lives only in the " +
        "upstream BM25 run derivation whose rounded scores both engines already share"),
    "txt_rrf_fusion" ->
      "rrf score is an exact small-rational sum rendered round(.., 9) on both engines",
  )

  test("registry is closed: every query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle (driver records only a " +
      s"weak rows-only check): ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("no oracle re-converts a decimal sum to DOUBLE") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !isValuesPin(sql) =>
        val decimalAliases =
          "(?i)::\\s*DECIMAL\\s*\\(\\d+\\s*,\\s*\\d+\\)\\s+AS\\s+(\\w+)".r
            .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val sumToDouble =
          "(?i)sum\\s*\\(\\s*(?:\\w+\\.)?(\\w+)\\s*\\)\\s*::\\s*DOUBLE".r
            .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val bad = sumToDouble.intersect(decimalAliases)
        if (bad.nonEmpty) Some(s"$name: sum(${bad.mkString(",")})::DOUBLE") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"""decimal-sum→DOUBLE re-conversion is environment-sensitive (r6 lesson);
         |ship the DECIMAL sum itself: ${offenders.mkString("; ")}""".stripMargin)
  }

  test("every double output riding transcendental oracle math is audited") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql)
          if transcendental.findFirstIn(sql).isDefined && !isValuesPin(sql)
            && !audited.contains(name) =>
        // schema-only: analysis, not execution (cheap even for heavy queries)
        val floatCols = SparkEntry.queries(name)(spark, sfDir).schema.fields
          .collect { case f if f.dataType == DoubleType || f.dataType == FloatType => f.name }
        if (floatCols.nonEmpty) Some(s"$name: ${floatCols.mkString(",")}") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"""unaudited DOUBLE/FLOAT output columns coexist with ln/exp/pow in the oracle —
         |round(.., <=9) them on BOTH engines (or ship DECIMAL) and add an audit entry:
         |${offenders.mkString("; ")}""".stripMargin)
  }

  test("audit table stays minimal: every entry's oracle still uses a transcendental") {
    val stale = audited.keys.filter { name =>
      SparkEntry.oracleSql.get(name).forall(sql =>
        transcendental.findFirstIn(sql).isEmpty || isValuesPin(sql))
    }
    assert(stale.isEmpty, s"drop stale audit entries: ${stale.mkString(", ")}")
  }
}
