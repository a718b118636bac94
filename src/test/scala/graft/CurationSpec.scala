package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags exactly the documents sharing a benchmark shingle") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark plans"),
      (3L, "another quick brown fox appears here"),
    ).toDF("id", "text")
    val benchmark = Seq(
      (100L, "watch the quick brown fox run"),
    ).toDF("id", "text")

    val got = Curation.decontaminate(corpus, benchmark, n = 3)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // doc 1 shares "the quick brown" and "quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing
    assert(got == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("decontaminate keeps one row per document even with repeated shingles") {
    // wordShingles is distinct per doc: a doc repeating the benchmark
    // trigram counts it once
    val corpus = Seq((1L, "a b c x a b c")).toDF("id", "text")
    val benchmark = Seq((9L, "a b c")).toDF("id", "text")
    val got = Curation.decontaminate(corpus, benchmark, n = 3).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
  }

  test("stratified sample is deterministic, honors per-stratum fractions, and filters only") {
    val docs = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val sample = Curation.stratifiedSample(
      docs, col("lang"), col("id"), Map("en" -> 0.5, "de" -> 0.1))
    val a = sample.collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.stratifiedSample(
      docs, col("lang"), col("id"), Map("en" -> 0.5, "de" -> 0.1))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b) // bit-reproducible
    val byLang = sample.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 uniform: expected 1000 en, 200 de; allow generous tolerance
    assert(byLang("en") > 800 && byLang("en") < 1200, byLang)
    assert(byLang("de") > 120 && byLang("de") < 280, byLang)
    // unknown strata fall to defaultFraction = 0.0 -> dropped entirely
    val other = (1L to 100L).map(i => (i, "zz")).toDF("id", "lang")
    assert(Curation.stratifiedSample(other, col("lang"), col("id"), Map("en" -> 1.0))
      .count() == 0L)
    // plan is a pure filter: no exchange anywhere
    assert(!sample.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
