package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval) joins. Spark executes a raw inequality
  * join as BroadcastNestedLoop (or a full cartesian when neither side
  * broadcasts) — quadratic and undistributable at fact×fact scale. The
  * standard scalable re-expression is BINNING: quantize the numeric
  * domain into fixed-width bins, explode each interval onto every bin it
  * covers, meet the two sides in a plain equi-join on (keys, bin), and
  * re-check the exact predicate. The quadratic pair space never
  * materializes; the cost is the equi-join plus an explode factor of
  * ceil(span / binWidth) per interval.
  *
  * Domains are numeric (LongType images). For timestamp data, bin on
  * `unix_micros(ts)` — exact integer microseconds, no double rounding.
  * Bin arithmetic is exact floor division over the whole long range
  * (negatives included): the pmod-adjusted numerator is an exact
  * multiple of the width and the division runs through the INTEGRAL
  * `div` operator — Spark's Column `/` would detour through doubles and
  * mis-bin beyond 2^53.
  */
object RangeJoin {

  /** Exact floor division of a long column by a positive constant, safe
    * over the WHOLE long range: integral `div` truncates toward zero, so
    * negative inexact quotients step down by one (a pmod-adjusted
    * numerator would overflow within binWidth-1 of Long.MinValue; the
    * q0-1 correction cannot overflow, since |q0| <= |x|/w and the w==1
    * case never takes the branch). Shared with [[ZOrder]]. */
  private[operators] def floorDiv(x: Column, w: Long): Column = {
    require(w > 0, s"floorDiv: width must be positive, got $w")
    val q0 = call_function("div", x, lit(w))
    when(x < 0 && x % lit(w) =!= 0, q0 - lit(1L)).otherwise(q0)
  }

  /** Points × intervals: emit one row per (point, interval) pair with
    * `start <= point <= end` (inclusive) and equal `keys`. Each point
    * owns exactly one bin, so a matching pair meets exactly once — no
    * dedup pass needed.
    *
    * Intervals wider than `maxBinsPerInterval * binWidth` fail the job
    * loudly (`raise_error`) rather than silently exploding the bin fan-out:
    * a mis-sized binWidth at 100 TB would otherwise turn one pathological
    * interval into millions of rows. Pick binWidth near the TYPICAL
    * interval span so most intervals cover 1-2 bins.
    *
    * @param points    side with `pointCol` (LongType domain image)
    * @param intervals side with `startCol`/`endCol` (same domain image)
    * @param keys      optional equi-key columns present on both sides
    * @return all point columns + all interval columns (names must not
    *         collide); rows with a null point/start/end drop (inner join)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerInterval: Int = 10000,
  ): DataFrame = {
    require(binWidth > 0, s"pointInInterval: binWidth must be positive, got $binWidth")
    val pointCols = points.columns.toSeq
    val ivalCols = intervals.columns.toSeq.filterNot(keys.contains)
    val collisions = pointCols.toSet.intersect(ivalCols.toSet) -- keys
    require(collisions.isEmpty,
      s"pointInInterval: column collision on ${collisions.mkString(", ")} — rename one side")

    val p2 = points.withColumn("_rj_bin", floorDiv(col(pointCol), binWidth))
    // The fan-out guard lives INSIDE the sequence() upper bound so it is
    // part of a consumed expression — a standalone guard column would be
    // legal prey for column pruning and could silently never evaluate.
    val guardedEnd = when(
      floorDiv(col(endCol), binWidth) - floorDiv(col(startCol), binWidth) >= maxBinsPerInterval,
      raise_error(lit(s"pointInInterval: interval spans more than $maxBinsPerInterval bins " +
        s"of width $binWidth — raise binWidth or maxBinsPerInterval")))
      .otherwise(floorDiv(col(endCol), binWidth))
    val i2 = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      .withColumn("_rj_bin", explode(sequence(floorDiv(col(startCol), binWidth), guardedEnd)))
    p2.join(i2, keys :+ "_rj_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bin")
  }

  /** Interval × interval overlap join: emit one row per (left, right)
    * pair with `lStart <= rEnd && rStart <= lEnd` and equal `keys`.
    * Overlapping pairs co-occur in every bin covering their
    * intersection; the FIRST such bin (the greater of the two start
    * bins) "owns" the pair and is the only one that emits it — the
    * classic ownership trick that avoids a distinct-shuffle dedup pass.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binWidth: Long,
      maxBinsPerInterval: Int = 10000,
  ): DataFrame = {
    require(binWidth > 0, s"intervalOverlap: binWidth must be positive, got $binWidth")
    val lCols = left.columns.toSeq.filterNot(keys.contains)
    val rCols = right.columns.toSeq.filterNot(keys.contains)
    val collisions = lCols.toSet.intersect(rCols.toSet)
    require(collisions.isEmpty,
      s"intervalOverlap: column collision on ${collisions.mkString(", ")} — rename one side")

    def binned(df: DataFrame, s: String, e: String): DataFrame = {
      // guard embedded in the consumed expression — see pointInInterval
      val guardedEnd = when(
        floorDiv(col(e), binWidth) - floorDiv(col(s), binWidth) >= maxBinsPerInterval,
        raise_error(lit(s"intervalOverlap: interval spans more than $maxBinsPerInterval bins of width $binWidth")))
        .otherwise(floorDiv(col(e), binWidth))
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
        .withColumn("_rj_bin", explode(sequence(floorDiv(col(s), binWidth), guardedEnd)))
    }
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), keys :+ "_rj_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_rj_bin") === greatest(floorDiv(col(lStart), binWidth), floorDiv(col(rStart), binWidth)))
      .drop("_rj_bin")
  }
}
