package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot/sqdist kernels must be bit-identical to the
  * higher-order-function folds they replace (the DuckDB oracles reproduce
  * the fold), including zip_with's null/length-mismatch semantics. */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofSqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  private val floatRows = Seq(
    (Seq(1.0f, 2.5f, -3.25f, 0.1f), Seq(4.0f, -1.5f, 2.0f, 7.7f)),
    (Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f, 4.0f)),
    (Seq(1e30f, -1e30f, 1.0f, 2.0f), Seq(1e8f, 1e8f, 0.5f, 0.25f)),
  )

  test("native dot == HOF fold, bit-exact, float arrays") {
    val df = floatRows.toDF("a", "b")
    val r = df.select(
      VectorExprs.dotNative(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("h")).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1))))
  }

  test("native sqdist == HOF fold, bit-exact, double arrays") {
    val df = floatRows.map { case (a, b) => (a.map(_.toDouble), b.map(_.toDouble)) }
      .toDF("a", "b")
    val r = df.select(
      VectorExprs.sqDistNative(col("a"), col("b")).as("n"),
      hofSqDist(col("a"), col("b")).as("h")).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1))))
  }

  test("mixed float x double literal matches HOF") {
    val planes = Seq(0.5, -0.25, 0.125, -1.0)
    val df = floatRows.toDF("a", "b")
    val r = df.select(
      VectorExprs.dotNative(col("a"), typedLit(planes)).as("n"),
      hofDot(col("a"), typedLit(planes)).as("h")).collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("length mismatch and null element yield NULL (zip_with padding semantics)") {
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(1.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
    ).toDF("a", "b")
    val r = df.select(
      VectorExprs.dotNative(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("h"),
      VectorExprs.sqDistNative(col("a"), col("b")).as("ns"),
      hofSqDist(col("a"), col("b")).as("hs")).collect()
    r.foreach { row =>
      assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
    }
  }

  test("empty arrays fold to 0.0") {
    val df = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    assert(df.select(VectorExprs.dotNative(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("kernel runs inside whole-stage codegen (range input defeats local-relation folding)") {
    val df = spark.range(100)
      .select(array((0 until 4).map(i => (col("id") + i).cast("double")): _*).as("a"))
      .select(VectorExprs.dotNative(col("a"), col("a")).as("d"))
    assert(df.agg(sum(col("d"))).head().getDouble(0) > 0.0)
    val codegenned = df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.isDefined, df.queryExecution.executedPlan.toString)
  }
}
