package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantize: endpoints, monotonicity, clamping, below-2^bits bound") {
    val df = Seq(-5L, 0L, 1L, 499L, 500L, 1000L, 2000L).toDF("v")
    val q = df.select(col("v"), ZOrder.quantize(col("v"), 0L, 1000L, 4).as("q"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q.head._2 == 0L, "below-min clamps to 0")       // -5
    assert(q.last._2 == q(5)._2, "above-max clamps to max") // 2000 == 1000
    assert(q.map(_._2) == q.map(_._2).sorted, "monotone")
    assert(q.forall(_._2 < 16), "stays below 2^bits")
  }

  test("interleave: known Morton value") {
    // x=0b101 -> bits at even positions (0,4): 1+16=17; y=0b011 -> odd (1,3): 2+8=10
    val df = Seq((5L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .collect().head.getLong(0)
    assert(z == 27L)
  }

  test("z-order chunks have tighter 2-d bounding boxes than row-major order") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val bounds = Seq((0L, 31L), (0L, 31L))
    def avgChunkArea(rows: Seq[(Long, Long)], chunk: Int): Double = {
      rows.grouped(chunk).map { c =>
        val xs = c.map(_._1); val ys = c.map(_._2)
        ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
      }.sum / (rows.size.toDouble / chunk)
    }
    val zOrdered = ZOrder.zorderSort(grid, Seq(col("x"), col("y")), bounds, bits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rowMajor = grid.orderBy("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val zArea = avgChunkArea(zOrdered, 64)
    val rmArea = avgChunkArea(rowMajor, 64)
    // 64-point z chunks are ~8x8 squares (area ~64); row-major chunks are
    // 2 full columns (area 2*32=64) — but z wins decisively on the
    // non-sorted dimension: check both dims' spans, not just area
    val zYSpan = zOrdered.grouped(64).map(c => c.map(_._2).max - c.map(_._2).min).max
    val rmYSpan = rowMajor.grouped(64).map(c => c.map(_._2).max - c.map(_._2).min).max
    assert(zYSpan < rmYSpan, s"z-order y-span $zYSpan !< row-major $rmYSpan")
    assert(zArea <= rmArea * 1.05, s"z avg area $zArea vs row-major $rmArea")
  }

  test("zValue validates argument arity") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("x")), Seq((0L, 1L), (0L, 1L)))
    }
    intercept[IllegalArgumentException] {
      ZOrder.quantize(col("x"), 5L, 5L, 4)
    }
  }
}
