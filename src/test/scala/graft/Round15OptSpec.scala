package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Round-15 OPTIMIZATION kernels: the sparse binned-vector merge-dot and
  * top-bin selection ([[graft.functions.BinVectorExprs]]) must be
  * value-identical to the higher-order-function forms they replaced in
  * [[graft.operators.SpectraCluster]] — pinned property-style over random
  * sparse vectors, plus the span-family gram-key parity (xxhash64 vs md5
  * produce the same spans when the realized gram set is collision-free —
  * the r15 default flip's contract). */
class Round15OptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // random bin-sorted sparse vectors (the BinPeaksExpr output contract):
  // strictly increasing bins, positive weights
  private val binnedGen: Gen[Seq[(Long, Double)]] =
    Gen.chooseNum(0, 12).flatMap { len =>
      Gen.listOfN(len, Gen.zip(Gen.chooseNum(100L, 140L), Gen.chooseNum(1, 999)))
        .map(_.groupBy(_._1).toSeq.map { case (b, xs) => (b, xs.map(_._2).sum.toDouble) }
          .sortBy(_._1))
    }

  private def toDf(pairs: Seq[(Seq[(Long, Double)], Seq[(Long, Double)])]) =
    pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ra", "rb")
      .select(col("id"),
        expr("transform(ra, e -> named_struct('bin', e._1, 'w', e._2))").as("ba"),
        expr("transform(rb, e -> named_struct('bin', e._1, 'w', e._2))").as("bb"))

  test("SortedBinDotExpr == aggregate/map_from_entries HOF fold (property)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = Gen.listOfN(80, Gen.zip(binnedGen, binnedGen)).sample.get ++
      Seq((Seq.empty[(Long, Double)], Seq.empty[(Long, Double)]),
        (Seq((100L, 2.0)), Seq.empty[(Long, Double)]),
        (Seq((100L, 2.0), (101L, 3.0)), Seq((101L, 5.0), (120L, 1.0))))
    val df = toDf(cases)
    val got = df.select(col("id"),
      graft.functions.BinVectorExprs.binDotCol(spark, col("ba"), col("bb")).as("d"))
      .orderBy(col("id")).collect().map(_.getDouble(1))
    val want = df
      .withColumn("mb", map_from_entries(col("bb")))
      .select(col("id"),
        aggregate(col("ba"), lit(0.0), (acc, e) =>
          acc + e.getField("w") *
            coalesce(try_element_at(col("mb"), e.getField("bin")), lit(0.0))).as("d"))
      .orderBy(col("id")).collect().map(_.getDouble(1))
    // bit-exact, not approximate: the kernel claims fold-order parity
    assert(got.toSeq == want.toSeq)
  }

  test("SortedBinDotExpr self-dot == aggregate w*w fold (norm parity)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = Gen.listOfN(60, binnedGen).sample.get
    val df = toDf(cases.map(c => (c, c)))
    val got = df.select(col("id"),
      graft.functions.BinVectorExprs.binDotCol(spark, col("ba"), col("ba")).as("d"))
      .orderBy(col("id")).collect().map(_.getDouble(1))
    val want = df.select(col("id"),
      aggregate(col("ba"), lit(0.0),
        (acc, e) => acc + e.getField("w") * e.getField("w")).as("d"))
      .orderBy(col("id")).collect().map(_.getDouble(1))
    assert(got.toSeq == want.toSeq)
  }

  test("TopBinsExpr == array_sort lambda + transform/slice chain (property)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = Gen.listOfN(80, binnedGen).sample.get ++ Seq(Seq.empty[(Long, Double)])
    val df = toDf(cases.map(c => (c, c)))
    for (n <- Seq(1, 3, 6, 20)) {
      val byWeight = array_sort(col("ba"),
        (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
          when(l.getField("w") > r.getField("w"), -1)
            .when(l.getField("w") < r.getField("w"), 1)
            .when(l.getField("bin") < r.getField("bin"), -1)
            .when(l.getField("bin") > r.getField("bin"), 1)
            .otherwise(0))
      val got = df.select(col("id"),
        graft.functions.BinVectorExprs.topBinsCol(spark, col("ba"), n).as("t"))
        .orderBy(col("id")).collect().map(_.getSeq[Long](1))
      val want = df.select(col("id"),
        transform(slice(byWeight, 1, n), e => e.getField("bin")).as("t"))
        .orderBy(col("id")).collect().map(_.getSeq[Long](1))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
  }

  test("span-family xxhash64 gram key == md5 gram key on collision-free corpora") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x a b c d e f g h i j y"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, ""),
      (6L, "one two three four"),
    ).toDF("id", "text")
    def run(ph: Boolean) = graft.operators.Dedup
      .substringDedup(docs, col("id"), col("text"), k = 5, portableHash = ph)
      .orderBy(col("id"), col("span_start")).collect().toSeq
    assert(run(true) == run(false))
    def runDup(ph: Boolean) = graft.operators.Dedup
      .duplicateSpans(docs, col("id"), col("text"), k = 5, portableHash = ph)
      .orderBy(col("id"), col("span_start")).collect().toSeq
    assert(runDup(true) == runDup(false))
    val bench = docs.filter(col("id") === 3L).select(col("text"))
    def runDecon(ph: Boolean) = graft.operators.Curation
      .decontaminateSpans(docs.filter(col("id") =!= 3L), col("id"), col("text"),
        bench, col("text"), k = 5, portableHash = ph)
      .orderBy(col("id"), col("span_start")).collect().toSeq
    assert(runDecon(true) == runDecon(false))
  }
}
