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

  test("applyChangelog: champion upsert/delete merge, idempotent under replay") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val ch = Seq(
      (2L, 100L, "U", "b2", 21.0), // update key 2
      (2L, 90L, "U", "stale", 19.0), // outvoted by version 100
      (3L, 100L, "D", null, 0.0), // delete key 3
      (4L, 100L, "I", "d", 40.0), // insert new key 4
      (5L, 100L, "I", "e", 50.0), (5L, 110L, "D", null, 0.0), // insert then delete
    ).toDF("k", "ver", "op", "name", "v")
    def apply(c: org.apache.spark.sql.DataFrame) =
      Incremental.applyChangelog(snap, c, col("k"), col("ver"), col("op"),
        Seq("name", "v"))
    val got = apply(ch).collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
    // replaying the same batch over the applied result is a no-op for
    // upserts; the deleted keys stay deleted
    val replayed = Incremental.applyChangelog(
      apply(ch).withColumnRenamed("key", "k"), ch, col("k"), col("ver"), col("op"),
      Seq("name", "v")).collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(replayed == got)
    // unknown op fails loudly
    val bad = Seq((1L, 1L, "X", "z", 0.0)).toDF("k", "ver", "op", "name", "v")
    intercept[Exception] { apply(bad).collect() }
  }
}
