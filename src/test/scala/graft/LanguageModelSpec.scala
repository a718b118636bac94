package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM training + stupid-backoff perplexity scoring. Expected values
  * come from an independent plain-Scala re-derivation of the same model
  * definition (counts, add-k unigram, backoff), not from the DataFrame
  * path under test. */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val trainDocs = Seq((1L, "a b a"), (2L, "a c")).toDF("id", "text")

  // Model over trainDocs with vocabSize=2 (binds: counts a=3,b=1,c=1 ->
  // {a,b} kept, c OOV), maxBigrams=10 (all of (a,b),(b,a),(a,c) kept).
  // N=5 tokens, V=3 full vocab, k=0.5 -> denom = 5 + 0.5*4 = 7.
  private lazy val lm =
    LanguageModel.trainBigramLm(trainDocs, col("text"), vocabSize = 2, maxBigrams = 10)

  private def pUni(c: Long): Double = (c + 0.5) / 7.0
  private def nl(p: Double): BigDecimal =
    BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private def mean6(xs: Seq[BigDecimal]): Double = {
    // mirror the operator's exact integer half-up mean
    val u = (xs.sum * 1000000).toLongExact
    ((u * 2 + xs.size) / (2L * xs.size)).toDouble / 1000000
  }

  test("train: caps bind deterministically, stats are uncapped") {
    val uni = lm.unigrams.orderBy(col("term")).as[(String, Long)].collect().toSeq
    assert(uni == Seq(("a", 3L), ("b", 1L)))
    val bi = lm.bigrams.orderBy(col("w1"), col("w2")).as[(String, String, Long)].collect().toSeq
    assert(bi == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L)))
    val st = lm.stats.as[(Long, Long)].collect().head
    assert(st == ((5L, 3L))) // N counts ALL tokens, V the full vocab incl. the capped-out c
  }

  test("score: bigram, first-token, OOV and backoff paths against hand math") {
    val scoreDocs = Seq(
      (1L, "a b a"), // all-bigram path
      (2L, "a c"),   // bigram (a,c) survives the cap even though c is OOV
      (3L, "c d"),   // OOV first token + backoff (no (c,d) bigram, c not in vocab)
    ).toDF("id", "text")
    val out = LanguageModel.scoreBigramLm(scoreDocs, col("id"), col("text"), lm)
      .orderBy(col("id")).as[(Long, Long, Double)].collect().toSeq
    val exp1 = mean6(Seq(nl(pUni(3)), nl(1.0 / 3.0), nl(1.0 / 1.0)))
    val exp2 = mean6(Seq(nl(pUni(3)), nl(1.0 / 3.0)))
    val exp3 = mean6(Seq(nl(pUni(0)), nl(0.4 * pUni(0))))
    assert(out == Seq((1L, 3L, exp1), (2L, 2L, exp2), (3L, 2L, exp3)))
  }

  test("score: empty and null documents keep a row with n_tokens 0 and null score") {
    val docs = Seq((1L, Some("a b")), (2L, Some("")), (3L, None), (4L, Some("   ")))
      .toDF("id", "text")
    val out = LanguageModel.scoreBigramLm(docs, col("id"), col("text"), lm)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, 2L, Some(mean6(Seq(nl(pUni(3)), nl(1.0 / 3.0))))),
      (2L, 0L, None), (3L, 0L, None), (4L, 0L, None)))
  }

  test("score: partitioning-layout invariant") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"a b c a ${"xyz" * (i % 3)}"))
      .toDF("id", "text")
    val one = LanguageModel.scoreBigramLm(docs.coalesce(1), col("id"), col("text"), lm)
      .orderBy(col("id")).collect().toSeq
    val many = LanguageModel.scoreBigramLm(docs.repartition(7), col("id"), col("text"), lm)
      .orderBy(col("id")).collect().toSeq
    assert(one == many)
  }

  test("train: tie at the vocab-cap boundary breaks lexicographically") {
    val docs = Seq((1L, "z y z y x")).toDF("id", "text")
    // counts: z=2, y=2, x=1; cap 1 -> y wins the tie over z at count 2
    val m = LanguageModel.trainBigramLm(docs, col("text"), vocabSize = 1, maxBigrams = 0)
    assert(m.unigrams.as[(String, Long)].collect().toSeq == Seq(("y", 2L)))
    assert(m.bigrams.count() == 0L) // maxBigrams=0: pure smoothed-unigram model
  }

  test("validation: bad hyperparameters are rejected loudly") {
    intercept[IllegalArgumentException] {
      LanguageModel.trainBigramLm(trainDocs, col("text"), vocabSize = 0, maxBigrams = 1)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.trainBigramLm(trainDocs, col("text"), vocabSize = 1, maxBigrams = -1)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.trainBigramLm(trainDocs, col("text"), vocabSize = 1, maxBigrams = 1, k = 0.0)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.scoreBigramLm(trainDocs, col("id"), col("text"), lm, backoff = 0.0)
    }
  }

  test("pmi collocations: hand-computed values, minCount gate, deterministic order") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    // N=6 (a=3, b=2, c=1), M=3 bigrams: (a,b)=2, (a,c)=1
    // pmi(a,b) = ln((2/3)/((3/6)*(2/6))) = ln 4; pmi(a,c) = ln((1/3)/((3/6)*(1/6))) = ln 4
    val out = LanguageModel.pmiCollocations(docs, col("text"), minCount = 1L, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 1.386294), ("a", "c", 1L, 1.386294)))
    // minCount 2 drops the singleton bigram
    val gated = LanguageModel.pmiCollocations(docs, col("text"), minCount = 2L, topK = 5)
      .collect()
    assert(gated.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
    val one = LanguageModel.pmiCollocations(docs.coalesce(1), col("text"), 1L, 5)
      .collect().toSeq
    val many = LanguageModel.pmiCollocations(docs.repartition(4), col("text"), 1L, 5)
      .collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      LanguageModel.pmiCollocations(docs, col("text"), minCount = 0L, topK = 5)
    }
  }

  test("vocabulary drift: identical snapshots give js exactly 0; disjoint ones don't") {
    val a = Seq((1L, "x y x"), (2L, "x z")).toDF("id", "text")
    val same = LanguageModel.vocabularyDrift(a, a, col("text"), vocabSize = 10)
      .collect()
    assert(same.forall(_.getAs[Long]("js_n9") == 0L))
    assert(same.forall(r => r.getAs[Long]("contrib_n9") == 0L))
    assert(same.map(_.getString(0)).contains("<oov>")) // fold row always present
    // disjoint vocabularies with counts big enough that the +1 smoothing
    // (which flattens tiny corpora toward uniform) stops dominating
    val bigA = Seq((1L, Seq.fill(200)("x y").mkString(" "))).toDF("id", "text")
    val bigB = Seq((1L, Seq.fill(200)("p q").mkString(" "))).toDF("id", "text")
    val js = LanguageModel.vocabularyDrift(bigA, bigB, col("text"), vocabSize = 10)
      .collect().head.getAs[Long]("js_n9")
    assert(js > 300000000L && js <= (math.log(2.0) * 1e9).toLong + 1L, s"js_n9=$js")
  }

  test("vocabulary drift: oov fold keeps both distributions summing to the totals") {
    // vocab cap 2 of 4 terms: the tail mass must land in <oov>
    val a = Seq((1L, "w w w x x y z")).toDF("id", "text")
    val b = Seq((1L, "w x")).toDF("id", "text")
    val rows = LanguageModel.vocabularyDrift(a, b, col("text"), vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // union counts: w=4, x=3, y=1, z=1 -> vocab {w, x}; oov a-side = y+z = 2
    assert(rows.map(_._1).sorted == Seq("<oov>", "w", "x"))
    assert(rows.find(_._1 == "<oov>").get._2 == 2L)
    assert(rows.map(_._2).sum == 7L && rows.map(_._3).sum == 2L)
    val one = LanguageModel.vocabularyDrift(a.coalesce(1), b, col("text"), 2)
      .collect().toSeq
    val many = LanguageModel.vocabularyDrift(a.repartition(5), b.repartition(3),
      col("text"), 2).collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      LanguageModel.vocabularyDrift(a, b, col("text"), vocabSize = 0)
    }
  }

  test("perplexityBuckets: quantile thresholds split head/middle/tail; empty docs NULL") {
    // 20 docs over a shared tiny vocab so lm scores spread; plus an empty doc
    val docs = ((1L to 20L).map { i =>
      (i, (Seq.fill((i % 4).toInt + 1)("a") ++ Seq.fill((i % 3).toInt)("b") ++ Seq(s"w$i")).mkString(" "))
    } :+ (99L, "")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLm(docs, col("text"), vocabSize = 5, maxBigrams = 20)
    val out = LanguageModel.perplexityBuckets(docs, col("id"), col("text"), lm,
      headFrac = 0.25, midFrac = 0.5)
    val rows = out.collect()
    assert(rows.length == 21)
    val byBucket = rows.filter(!_.isNullAt(3)).groupBy(_.getString(3)).view.mapValues(_.length).toMap
    // interpolated quantiles put ~25% head, ~50% middle, ~25% tail (ties
    // can shift a few across boundaries but all three must be populated)
    assert(byBucket.keySet == Set("head", "middle", "tail"), byBucket)
    assert(byBucket("head") >= 3 && byBucket("tail") >= 3, byBucket)
    // bucket assignment is monotone in lm_score
    val sorted = rows.filter(!_.isNullAt(3)).sortBy(_.getDouble(2))
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(order(a.getString(3)) <= order(b.getString(3)))
      case _ => ()
    }
    // empty doc: NULL score, NULL bucket
    val empty = rows.find(_.getLong(0) == 99L).get
    assert(empty.isNullAt(2) && empty.isNullAt(3))
    intercept[IllegalArgumentException] {
      LanguageModel.perplexityBuckets(docs, col("id"), col("text"), lm, 0.5, 0.5)
    }
  }
}
