package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: codebook training, encode, ADC top-k. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private def mkVecs(n: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }
  private def toDf(v: Seq[(Long, Seq[Float])]) = v.toDF("id", "vec")

  test("trainPq with 0 iterations pins codebooks to the smallest-id sub-slices") {
    val vecs = mkVecs(20, 1)
    val model = Similarity.trainPq(toDf(vecs), dim, nSub = 2, nCodes = 4, kmeansIters = 0)
    assert(model.nSub == 2 && model.nCodes == 4 && model.subDim == 4)
    val first4 = vecs.sortBy(_._1).take(4).map(_._2.map(_.toDouble))
    (0 until 2).foreach { m =>
      val cb = model.codebooks(m).sortBy(_._1).map(_._2)
      assert(cb == first4.map(_.slice(m * 4, m * 4 + 4)))
    }
  }

  test("pqEncode codes match a plain-Scala argmin over the codebooks") {
    val vecs = mkVecs(50, 2)
    val df = toDf(vecs)
    val model = Similarity.trainPq(df, dim, nSub = 4, nCodes = 4, kmeansIters = 2)
    val got = Similarity.pqEncode(df, model)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("codes").toSeq)
      .toMap
    vecs.foreach { case (id, v) =>
      val want = (0 until 4).map { m =>
        val sub = v.map(_.toDouble).slice(m * 2, m * 2 + 2)
        model.codebooks(m).sortBy(_._1).minBy { case (_, cent) =>
          // strict-improvement ascending scan == min by (d, cell)
          (sub.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum, 0)
        }._1
      }
      assert(got(id) == want, s"id=$id")
    }
  }

  test("pqTopK with a full-width oversample equals the exact brute force") {
    val df = toDf(mkVecs(30, 3))
    val model = Similarity.trainPq(df, dim, nSub = 4, nCodes = 4, kmeansIters = 1)
    val queries = df.filter(col("id") < 5)
    // k*oversample >= corpus-1 -> every pair survives to the exact re-rank
    val pq = Similarity.pqTopK(df, queries, k = 5, model, oversample = 6)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val bf = Similarity.bruteForceTopK(df, queries, k = 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(pq == bf)
  }

  test("pqTopK finds a planted near-duplicate at rank 1 with a small oversample") {
    val base = mkVecs(200, 4)
    val planted = base :+ (999L, base.head._2.map(x => x + 0.001f))
    val df = toDf(planted)
    val model = Similarity.trainPq(df, dim, nSub = 4, nCodes = 8, kmeansIters = 3)
    val out = Similarity.pqTopK(df, df.filter(col("id") === 0L), k = 3, model, oversample = 2)
      .orderBy(col("rank")).collect()
    assert(out.head.getAs[Long]("neighbor_id") == 999L)
    assert(out.head.getAs[Double]("cosine") > 0.999)
  }

  test("pqTopK is partitioning-layout invariant") {
    val df = toDf(mkVecs(60, 5))
    val model = Similarity.trainPq(df, dim, nSub = 2, nCodes = 4, kmeansIters = 2)
    val q = df.filter(col("id") < 3)
    val a = Similarity.pqTopK(df.coalesce(1), q, k = 4, model)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val b = Similarity.pqTopK(df.repartition(7), q, k = 4, model)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(a == b)
  }

  test("ivfPqTopK: probing every cell with a full-width oversample equals brute force") {
    val df = toDf(mkVecs(40, 7))
    val model = Similarity.trainPq(df, dim, nSub = 4, nCodes = 4, kmeansIters = 1)
    val idx = Similarity.buildIvfIndex(df, nCells = 4, kmeansIters = 2)
    try {
      val q = df.filter(col("id") < 4)
      val got = Similarity.ivfPqTopK(idx, model, df, q, k = 5, nProbe = 4, oversample = 8)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      val bf = Similarity.bruteForceTopK(df, q, k = 5)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      assert(got == bf)
    } finally idx.release()
  }

  test("ivfPqTopK: planted near-duplicate found with a narrow probe") {
    val base = mkVecs(300, 8)
    val planted = base :+ (999L, base.head._2.map(x => x + 0.001f))
    val df = toDf(planted)
    val model = Similarity.trainPq(df, dim, nSub = 4, nCodes = 8, kmeansIters = 3)
    val idx = Similarity.buildIvfIndex(df, nCells = 8, kmeansIters = 3)
    try {
      val out = Similarity.ivfPqTopK(idx, model, df, df.filter(col("id") === 0L),
        k = 3, nProbe = 2, oversample = 3)
        .orderBy(col("rank")).collect()
      assert(out.head.getAs[Long]("neighbor_id") == 999L)
    } finally idx.release()
  }

  test("validation: bad shapes are rejected loudly") {
    val df = toDf(mkVecs(10, 6))
    intercept[IllegalArgumentException] {
      Similarity.trainPq(df, dim, nSub = 3, nCodes = 2) // 3 does not divide 8
    }
    intercept[IllegalArgumentException] {
      Similarity.PqModel(Seq(Seq(0 -> Seq(1.0), 2 -> Seq(2.0))), 1) // gap in cells
    }
    val model = Similarity.trainPq(df, dim, nSub = 2, nCodes = 2, kmeansIters = 0)
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, df, k = 2, model, oversample = 0)
    }
  }
}
