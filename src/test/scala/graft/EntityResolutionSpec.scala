package graft

import graft.operators.EntityResolution
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records = Seq(
    (1L, "jonathan smith", "NY"),
    (2L, "jonathon smith", "NY"),  // distance 1 from #1
    (3L, "jon smith", "NY"),       // distance 6 from #1 — beyond bound
    (4L, "jonathan smith", "CA"),  // identical name, different block
    (5L, "maria garcia", "NY"),
    (6L, "mario garcia", "NY"),    // distance 1 from #5
    (7L, null, "NY"),              // null name never matches
  ).toDF("id", "name", "region")

  test("fuzzy pairs match within blocks only, each unordered pair once") {
    val out = EntityResolution
      .blockedFuzzyPairs(records, "id", "name", Seq("region"), maxDistance = 2)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("distance")))
      .toSeq
    // (1,2) d=1 and (5,6) d=1; #3 too far, #4 blocked apart, #7 null
    assert(out == Seq((1L, 2L, 1L), (5L, 6L, 1L)))
  }

  test("maxDistance 0 degenerates to exact-name pairs within a block") {
    val dup = Seq((1L, "acme", "X"), (2L, "acme", "X"), (3L, "acme", "X"))
      .toDF("id", "name", "region")
    val out = EntityResolution
      .blockedFuzzyPairs(dup, "id", "name", Seq("region"), maxDistance = 0)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    assert(out == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("oversized block fails loudly instead of running quadratic") {
    val ex = intercept[Exception] {
      EntityResolution.blockedFuzzyPairs(records, "id", "name", Seq("region"),
        maxDistance = 2, maxBlockSize = 3).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(ex).contains("block"))
  }

  test("oversized block fails even when every pair would fail the cheap gates") {
    // names of wildly different lengths: every pair dies at the length
    // gate, but the size guard must STILL fire (it rides the pre-join
    // id projection, not the surviving pairs)
    val skewed = Seq(
      (1L, "a", "X"), (2L, "bbbbbbbbbb", "X"), (3L, "c" * 20, "X"),
      (4L, "d" * 30, "X"), (5L, "e" * 40, "X"),
    ).toDF("id", "name", "region")
    val ex = intercept[Exception] {
      EntityResolution.blockedFuzzyPairs(skewed, "id", "name", Seq("region"),
        maxDistance = 2, maxBlockSize = 3).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(ex).contains("block"))
  }

  test("empty blocking is rejected") {
    intercept[IllegalArgumentException] {
      EntityResolution.blockedFuzzyPairs(records, "id", "name", Seq.empty, maxDistance = 1)
    }
  }
}
