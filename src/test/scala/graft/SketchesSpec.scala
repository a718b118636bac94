package graft

import graft.functions.TextFunctions
import graft.operators.{Sketches, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmv below k is the exact distinct count, duplicates ignored") {
    val df = (1 to 500).map(i => i % 7).toDF("v") // 7 distinct values
    val row = Sketches.kmvDistinct(df, "v", col("v"), k = 64).collect().head
    assert(row.getAs[Long]("n_kmv") == 7L)
    assert(row.getAs[Double]("estimate") == 7.0)
  }

  test("kmv estimate lands near the true cardinality and is partitioning-invariant") {
    val df = (1 to 5000).toDF("v")
    val est = Sketches.kmvDistinct(df, "v", col("v"), k = 128).collect().head
      .getAs[Double]("estimate")
    // KMV relative error ~ 1/sqrt(k-1) ≈ 9%; allow 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.27, s"estimate $est")
    for (n <- Seq(1, 3, 13)) {
      val est2 = Sketches.kmvDistinct(df.repartition(n), "v", col("v"), k = 128)
        .collect().head.getAs[Double]("estimate")
      assert(est2 == est, s"estimate varies with partitioning at n=$n")
    }
  }

  test("kmv min-hash set equals the brute-force k smallest distinct hashes") {
    val df = (1 to 300).map(i => s"doc-$i").toDF("v")
    val got = Sketches.kmvMinHashes(df, col("v"), k = 16)
      .as[Long].collect().toSeq
    val want = df.select(TextFunctions.portableHash32(col("v").cast("string")).as("h"))
      .distinct().orderBy("h").limit(16).as[Long].collect().toSeq
    assert(got == want)
  }

  test("kmv of an empty input reports zero") {
    val row = Sketches.kmvDistinct(Seq.empty[Int].toDF("v"), "v", col("v"), k = 8)
      .collect().head
    assert(row.getAs[Long]("n_kmv") == 0L && row.getAs[Double]("estimate") == 0.0)
  }

  test("heavy hitters: count-desc then key-asc, exactly k rows") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("k")
    val out = Skew.heavyHitters(df, col("k"), 3)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"))).toSeq
    assert(out == Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }
}
