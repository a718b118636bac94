package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** exactQuantiles under value concentration and extreme ranges
  * (round-12, verdict r11 item 7 + ADVICE overflow item). */
class ConcentratedQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[Long], percents: Seq[Int], maxSortRows: Long): Unit = {
    val df = values.toDF("x")
    val got = DataQuality.exactQuantiles(df, col("x"), percents, maxSortRows)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val sorted = values.sorted
    val want = percents.distinct.sorted.map { q =>
      val rank = (values.length - 1).toLong * q / 100L + 1L
      (q, values.length.toLong, rank, sorted((rank - 1).toInt))
    }
    assert(got == want, s"got $got want $want")
  }

  test("90%-one-value corpus resolves through the min==max shortcut, no big sort") {
    // 90k copies of 7777 + 10k spread values; maxSortRows=100 forces the
    // heavy path for every quantile landing in the concentrated bucket —
    // which resolves by recursion + the min==max shortcut, never a
    // 90k-row single-partition sort.
    val values = Seq.fill(90000)(7777L) ++ (0 until 10000).map(i => (i * 13 + 1000000).toLong)
    check(values, Seq(0, 10, 50, 89, 95, 100), maxSortRows = 100)
  }

  test("full-range 64-bit values bucket without overflow (hash-column shape)") {
    // old width = floorDiv(hi - lo, 65536) + 1 wrapped when hi - lo
    // overflowed; the floorDiv form never subtracts
    val values = Seq(Long.MinValue, Long.MinValue + 5, -1L, 0L, 1L,
      Long.MaxValue - 3, Long.MaxValue) ++ (0 until 100).map(i => i * 1000000007L)
    check(values, Seq(0, 25, 50, 75, 100), maxSortRows = 1L << 20)
    check(values, Seq(0, 25, 50, 75, 100), maxSortRows = 2) // force recursion everywhere
  }

  test("light path unchanged and heavy/light mixtures agree") {
    val values = (0 until 5000).map(i => (i % 97).toLong)
    check(values, Seq(1, 33, 66, 99), maxSortRows = 1L << 20) // all light
    check(values, Seq(1, 33, 66, 99), maxSortRows = 10) // all heavy
  }

  test("constant column short-circuits with zero distributed jobs after stats") {
    check(Seq.fill(1000)(42L), Seq(0, 50, 100), maxSortRows = 5)
  }
}
