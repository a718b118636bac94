package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic Sennrich corpus: low*5 lower*2 newest*6 widest*3
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest"),
  ).toDF("id", "text")

  test("train reproduces the classic merge sequence with deterministic tie-breaks") {
    val merges = Bpe.train(corpus, col("text"), nMerges = 5)
    assert(merges == Seq(
      ("e", "s"),        // 9, ties (s,t)/(t,</w>) break lexicographically
      ("es", "t"),       // 9
      ("est", "</w>"),   // 9
      ("l", "o"),        // 7, tie with (o,w)
      ("lo", "w"),       // 7
    ))
  }

  test("train is partitioning-invariant") {
    val m1 = Bpe.train(corpus.repartition(7), col("text"), nMerges = 5)
    val m2 = Bpe.train(corpus.coalesce(1), col("text"), nMerges = 5)
    assert(m1 == m2)
  }

  test("train stops early when no pair repeats") {
    val tiny = Seq((1L, "ab cd")).toDF("id", "text")
    assert(Bpe.train(tiny, col("text"), nMerges = 10).isEmpty)
  }

  test("greedy encode applies merges by rank; unseen words stay characters") {
    val ranks = Bpe.train(corpus, col("text"), nMerges = 5).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) == Vector("low", "est</w>"))
    assert(Bpe.encodeWord("newest", ranks) == Vector("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("xyz", ranks) == Vector("x", "y", "z", "</w>"))
  }

  test("saveMerges/loadMerges parquet round-trip preserves rank order") {
    val merges = Bpe.train(corpus, col("text"), nMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-rt").toString
    Bpe.saveMerges(spark, merges, dir)
    val back = Bpe.loadMerges(spark, dir)
    // rank order IS the semantics: the reloaded sequence must be equal
    assert(back == merges)
    val r1 = merges.zipWithIndex.toMap
    val r2 = back.zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", r2) == Bpe.encodeWord("lowest", r1))
  }

  test("encode: distributed output matches per-word greedy encode, null text is empty") {
    val merges = Bpe.train(corpus, col("text"), nMerges = 5)
    val docs = Seq((1L, "low lowest"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val got = Bpe.encode(docs, col("id"), col("text"), merges)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Seq[String]]("tokens"), r.getAs[Long]("n_tokens")))
    assert(got(0) == ((1L, Seq("low", "</w>", "low", "est</w>"), 4L)))
    assert(got(1) == ((2L, Seq.empty[String], 0L)))
  }
}
