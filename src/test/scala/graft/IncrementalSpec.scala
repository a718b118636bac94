package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = (1L to 300L).map(i =>
    (i, i % 7, if (i % 13 == 0) None else Some(i * 0.125))) // exact binary fractions
  private lazy val df = rows.toDF("id", "k", "v")

  test("merged batch states are bit-identical to a full recompute") {
    val full = Incremental.stateMetrics(
      Incremental.aggState(df, col("k"), col("v")))
      .orderBy(col("key")).collect().toSeq
    val merged = Incremental.stateMetrics(Incremental.mergeStates(Seq(
      Incremental.aggState(df.filter(col("id") % 3 === 0), col("k"), col("v")),
      Incremental.aggState(df.filter(col("id") % 3 === 1), col("k"), col("v")),
      Incremental.aggState(df.filter(col("id") % 3 === 2), col("k"), col("v")))))
      .orderBy(col("key")).collect().toSeq
    assert(merged == full)
    // merge order cannot matter
    val reordered = Incremental.stateMetrics(Incremental.mergeStates(Seq(
      Incremental.aggState(df.filter(col("id") % 3 === 2), col("k"), col("v")),
      Incremental.aggState(df.filter(col("id") % 3 === 0), col("k"), col("v")),
      Incremental.aggState(df.filter(col("id") % 3 === 1), col("k"), col("v")))))
      .orderBy(col("key")).collect().toSeq
    assert(reordered == full)
  }

  test("incremental fold: state ∪ new batch == recompute over both") {
    val old = df.filter(col("id") <= 200)
    val batch = df.filter(col("id") > 200)
    val folded = Incremental.mergeStates(Seq(
      Incremental.aggState(old, col("k"), col("v")),
      Incremental.aggState(batch, col("k"), col("v"))))
    val direct = Incremental.aggState(df, col("k"), col("v"))
    assert(Incremental.stateMetrics(folded).orderBy(col("key")).collect().toSeq ==
      Incremental.stateMetrics(direct).orderBy(col("key")).collect().toSeq)
  }

  test("all-null keys report n=0 with NULL metrics; validation") {
    val d = Seq((1L, Some(1.0)), (1L, None), (2L, None)).toDF("k", "v")
    val m = Incremental.stateMetrics(Incremental.aggState(d, col("k"), col("v")))
      .orderBy(col("key")).collect()
    assert(m(0).getLong(1) == 1L)
    assert(m(1).getLong(1) == 0L && m(1).isNullAt(2) && m(1).isNullAt(3))
    intercept[IllegalArgumentException] { Incremental.mergeStates(Nil) }
    intercept[IllegalArgumentException] {
      Incremental.mergeStates(Seq(Seq((1L, 2L)).toDF("key", "n")))
    }
  }
}
