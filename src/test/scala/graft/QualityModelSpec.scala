package graft

import graft.functions.TextFunctions
import graft.operators.QualityModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("score equals the hand-computed bucket-weight mean; null/empty yield 0.0") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "   "),
    ).toDF("doc_id", "text")
    val got = QualityModel.scoreDocs(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_tokens"), r.getAs[Double]("score")))

    // independent computation of doc 1's expected score via the same hash
    val bucketOf = Seq("alpha", "beta").toDF("t")
      .select(col("t"), pmod(TextFunctions.portableHash32(col("t")), lit(64)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    val milli = 2 * QualityModel.weightsMilli(bucketOf("alpha")) +
      QualityModel.weightsMilli(bucketOf("beta"))
    val expected = milli.toDouble / 1000.0 / 3
    assert(got(0) == ((1L, 3L, expected)))
    assert(got(1) == ((2L, 0L, 0.0)))
    assert(got(2) == ((3L, 0L, 0.0)))
    assert(got(3) == ((4L, 0L, 0.0)))
  }

  test("scoring is a zero-shuffle projection (no Exchange in the plan)") {
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = QualityModel.scoreDocs(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  /** Plain-Scala replay of the quantized-gradient recurrence. */
  private def bruteLogReg(
      rows: Seq[(Seq[Double], Double)], iters: Int, lr: Double): Seq[Double] = {
    val d = rows.head._1.size
    var w = Seq.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val sums = (0 until d).map { j =>
        rows.map { case (x, y) =>
          val m = (0 until d).map(i => w(i) * x(i)).reduce(_ + _)
          val g = y - 1.0 / (1.0 + math.exp(-m))
          math.floor(g * x(j) * 1e9 + 0.5).toLong
        }.sum
      }
      w = (0 until d).map(j => w(j) + lr * (sums(j).toDouble / 1e9 / rows.size))
    }
    w
  }

  test("trainLogReg matches the plain-Scala quantized-gradient replay exactly") {
    val rows = Seq(
      (Seq(1.0, 2.0), 1.0), (Seq(1.0, 8.0), 0.0),
      (Seq(1.0, 1.5), 1.0), (Seq(1.0, 9.0), 0.0), (Seq(1.0, 3.0), 1.0))
    val df = rows.map { case (x, y) => (x(0), x(1), y) }.toDF("x0", "x1", "y")
    for (parts <- Seq(1, 3)) {
      val w = QualityModel.trainLogReg(df.repartition(parts),
        Seq(col("x0"), col("x1")), col("y"), iters = 3, lr = 0.5)
      assert(w == bruteLogReg(rows, 3, 0.5), s"parts=$parts")
    }
    // the gate separates: short docs (x1 small) score above long ones
    val w = QualityModel.trainLogReg(df, Seq(col("x0"), col("x1")), col("y"), iters = 10)
    assert(w(1) < 0.0) // negative weight on the feature that predicts label 0
  }

  test("trainLogReg drops NULL rows and rejects an all-null frame") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(1.0)), (Some(1.0), None, Some(0.0)),
      (Some(1.0), Some(3.0), None),
    ).toDF("x0", "x1", "y")
    val w = QualityModel.trainLogReg(df, Seq(col("x0"), col("x1")), col("y"), iters = 1)
    val wClean = QualityModel.trainLogReg(
      Seq((1.0, 2.0, 1.0)).toDF("x0", "x1", "y"),
      Seq(col("x0"), col("x1")), col("y"), iters = 1)
    assert(w == wClean) // only the complete row trained
    intercept[IllegalArgumentException] {
      QualityModel.trainLogReg(
        Seq((Option.empty[Double], 1.0)).toDF("x0", "y"),
        Seq(col("x0")), col("y"), iters = 1)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainLogReg(df, Seq(col("x0")), col("y"), iters = 0)
    }
  }

  test("scoreBigramLm carry columns surface per doc, including empty docs") {
    import graft.operators.LanguageModel
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, "b b")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLm(docs, col("text"), 10, 10)
    val got = LanguageModel.scoreBigramLm(docs, col("id"), col("text"), lm,
        carry = Seq("tag" -> length(col("text")).cast("long")))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("tag"))).toSeq
    assert(got == Seq((1L, 3L, 5L), (2L, 0L, 0L), (3L, 2L, 3L)))
  }

  test("ensembleQuality: calibrated CDFs, weighted mean, NULL for empty docs") {
    import graft.operators.LanguageModel
    // 30 docs: varying length/stopword content plus one empty doc
    val docs = ((1L to 30L).map { i =>
      val words = Seq.fill((i % 5).toInt + 3)(s"w$i") ++ Seq("the", "of")
      (i, words.mkString(" "))
    } :+ (99L, "")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLm(docs, col("text"), vocabSize = 10, maxBigrams = 50)
    val out = QualityModel.ensembleQuality(docs, col("id"), col("text"), lm, buckets = 10)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 31)
    // empty doc: n_tokens 0, NULL lm_score -> NULL cal_lm and NULL ensemble
    val empty = rows(99L)
    assert(empty.getAs[Long]("n_tokens") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("lm_score")))
    assert(empty.isNullAt(empty.fieldIndex("cal_lm")))
    assert(empty.isNullAt(empty.fieldIndex("ensemble")))
    // calibrated values are CDFs: in (0, 1], and the ensemble is exactly
    // the fixed-association weighted mean of them
    rows.values.filterNot(_.isNullAt(rows(1L).fieldIndex("ensemble"))).foreach { r =>
      val ch = r.getAs[Double]("cal_heuristic")
      val cm = r.getAs[Double]("cal_model")
      val cl = r.getAs[Double]("cal_lm")
      assert(ch > 0.0 && ch <= 1.0 && cm > 0.0 && cm <= 1.0 && cl > 0.0 && cl <= 1.0)
      assert(r.getAs[Double]("ensemble") == 0.25 * ch + 0.35 * cm + 0.40 * (1.0 - cl))
    }
    // calibration is monotone: a doc with a strictly higher raw model
    // score never gets a lower calibrated one
    val byModel = rows.values.toSeq.sortBy(_.getAs[Double]("q_model"))
    byModel.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getAs[Double]("cal_model") <= b.getAs[Double]("cal_model"))
    case _ => ()
    }
    // deterministic across partitionings
    val again = QualityModel.ensembleQuality(
      docs.repartition(7), col("id"), col("text"), lm, buckets = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("q_model"),
        Option(r.getAs[Any]("ensemble")))).sortBy(_._1).toSeq
    val first = out.collect().map(r => (r.getLong(0), r.getAs[Double]("q_model"),
      Option(r.getAs[Any]("ensemble")))).sortBy(_._1).toSeq
    assert(first == again)
  }

  test("ensembleQuality rejects degenerate bucket counts") {
    import graft.operators.LanguageModel
    val docs = Seq((1L, "a b")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLm(docs, col("text"), 10, 10)
    intercept[IllegalArgumentException] {
      QualityModel.ensembleQuality(docs, col("id"), col("text"), lm, buckets = 1)
    }
  }
}
