package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDf = QueryShared.unigramFixtureCorpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("spark word-count head equals the pure-Scala count (oracle twin contract)") {
    val viaSpark = Unigram.wordCounts(fixtureDf, col("text"))
    val pure = QueryShared.unigramFixtureCorpus
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, n) => (-n, w) }
    assert(viaSpark == pure)
  }

  test("training is deterministic, learns multi-char pieces, keeps all single chars") {
    val counts = Unigram.wordCounts(fixtureDf, col("text"))
    val m1 = Unigram.trainFromCounts(counts, vocabSize = 80, maxPieceLen = 4)
    val m2 = Unigram.trainFromCounts(counts, vocabSize = 80, maxPieceLen = 4)
    assert(m1.costs == m2.costs)
    assert(m1.vocab.exists(_.length > 1), "EM learned no multi-char piece")
    val chars = counts.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(m1.vocab), "a corpus character fell out of the vocabulary")
    assert(m1.costs == QueryShared.unigramFixtureModel.costs)
  }

  test("viterbi segmentation is cost-optimal (vs exhaustive) and covers the word") {
    val model = QueryShared.unigramFixtureModel
    val unk = model.costs.values.max + 1000000L
    def cost(toks: Seq[String]): Long =
      toks.map(t => model.costs.getOrElse(t, if (t.length == 1) unk else Long.MaxValue / 4)).sum
    def allSegs(w: String): Seq[Vector[String]] =
      if (w.isEmpty) Seq(Vector.empty)
      else (1 to math.min(model.maxPieceLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (model.vocab.contains(p) || l == 1) allSegs(w.substring(l)).map(p +: _)
        else Seq.empty
      }
    for (w <- Seq("tokens", "unhappiest", "runner", "zebra", "brightness")) {
      val got = Unigram.viterbiEncodeWord(w, model)
      assert(got.mkString("") == w)
      val best = allSegs(w).map(cost).min
      assert(cost(got) == best, s"$w: viterbi ${cost(got)} vs exhaustive $best")
    }
  }

  test("longest-match rule: greedy prefix, unknown chars pass through") {
    val model = Unigram.Model(Map("ab" -> 1L, "abc" -> 2L, "a" -> 3L, "b" -> 3L, "c" -> 3L), 4)
    assert(Unigram.longestMatchEncodeWord("abcab", model) == Vector("abc", "ab"))
    assert(Unigram.longestMatchEncodeWord("xab", model) == Vector("x", "ab"))
    assert(Unigram.longestMatchEncodeWord("", model).isEmpty)
  }

  test("saveModel/loadModel parquet round-trip is exact") {
    val model = QueryShared.unigramFixtureModel
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram-rt").toString
    Unigram.saveModel(spark, model, dir)
    val back = Unigram.loadModel(spark, dir)
    // costs are integer-quantized and maxPieceLen is stored, so the
    // reloaded model must be EQUAL, not just equivalent
    assert(back.costs == model.costs)
    assert(back.maxPieceLen == model.maxPieceLen)
    // and segmentation from the reloaded artifact is identical
    for (w <- Seq("unhappiness", "tokenizer", "qzx"))
      assert(Unigram.viterbiEncodeWord(w, back) == Unigram.viterbiEncodeWord(w, model))
  }

  test("encode: distributed output is partitioning-invariant, nulls empty") {
    val model = QueryShared.unigramFixtureModel
    val docs = Seq((1L, "the unhappiest tokenizer"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame, vit: Boolean) =
      Unigram.encode(df, col("id"), col("text"), model, viterbi = vit)
        .orderBy(col("id")).collect().map(r =>
          (r.getLong(0), r.getSeq[String](1).toList, r.getLong(2))).toSeq
    for (vit <- Seq(true, false)) {
      val a = run(docs.repartition(5), vit)
      val b = run(docs.coalesce(1), vit)
      assert(a == b)
      assert(a(1)._2.isEmpty && a(1)._3 == 0L)
      assert(a(0)._2.mkString("") == "theunhappiesttokenizer")
    }
  }
}
