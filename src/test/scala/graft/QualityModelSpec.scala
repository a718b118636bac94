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
}
