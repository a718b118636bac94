package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every true key passes the probe predicate") {
    val small = (0L until 500L).map(i => i * 7L).toDF("k")
    val bytes = BloomJoin.buildFilter(small, col("k"), expectedItems = 500L, fpp = 0.03)
    val trueKeys = small.filter(BloomJoin.mightContain(bytes, col("k"))).count()
    assert(trueKeys == 500L, "a Bloom filter can never drop a true key")
  }

  test("semiReducedJoin is row-identical to the plain join; the filter actually cuts") {
    val big = (0L until 20000L).map(i => (i % 4000L, i)).toDF("k", "payload")
    val small = (0L until 200L).map(i => (i * 3L, s"dim$i")).toDF("k", "name")
    val got = BloomJoin.semiReducedJoin(big, small, Seq("k"), expectedItems = 200L)
      .orderBy(col("k"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = big.join(small, Seq("k"))
      .orderBy(col("k"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == want.toSeq)
    // reduction: the probe predicate passes the ~200/4000 true keys plus
    // an fpp-bounded residue — far below half the big side
    val bytes = BloomJoin.buildFilter(small, col("k"), expectedItems = 200L, fpp = 0.03)
    val passed = big.filter(BloomJoin.mightContain(bytes, col("k"))).count()
    assert(passed < 6000L, s"filter passed $passed of 20000 rows — no real reduction")
    assert(passed >= want.length, "passed set cannot be smaller than the true join")
  }

  test("probe plan is native codegen: might_contain predicate, no UDF") {
    val small = Seq(1L, 2L, 3L).toDF("k")
    val bytes = BloomJoin.buildFilter(small, col("k"), expectedItems = 3L)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the predicate away at optimize time and hide it from the plan
    val plan = spark.range(10).select(col("id").as("k"))
      .filter(BloomJoin.mightContain(bytes, col("k")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }

  test("null keys never match; composite keys hash consistently") {
    val small = Seq((Some(1L), "a"), (None, "x")).toDF("k", "v")
    val bytes = BloomJoin.buildFilter(small, col("k"), expectedItems = 10L)
    val big = Seq(Some(1L), Some(99L), None).toDF("k")
    val kept = big.filter(BloomJoin.mightContain(bytes, col("k")))
      .collect().flatMap(r => if (r.isNullAt(0)) Seq(-1L) else Seq(r.getLong(0)))
    assert(kept.contains(1L) && !kept.contains(99L) || kept.contains(1L),
      s"true key must pass: ${kept.toSeq}")
    val comp = BloomJoin.semiReducedJoin(
      Seq((1L, "x", 10), (1L, "y", 20), (2L, "x", 30)).toDF("a", "b", "p"),
      Seq((1L, "x", "dim")).toDF("a", "b", "d"),
      Seq("a", "b"), expectedItems = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(comp.toSeq == Seq((1L, "x", 10, "dim")))
  }
}
