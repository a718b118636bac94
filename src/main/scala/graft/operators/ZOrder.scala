package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional data skipping.
  *
  * A table range-sorted on one column prunes scans on that column only;
  * at 100 TB the second predicate column rescans everything. Sorting by
  * the bit-interleaved Z-value of several columns gives every file a
  * tight min/max envelope on ALL of them, so the format-level zone maps
  * (parquet row-group stats) prune multi-predicate scans — the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, re-expressed as plain
  * column arithmetic + one range sort.
  *
  * The whole computation is quantize → interleave with shifts/masks —
  * pure integer expressions (codegen'd, engine-portable: the DuckDB
  * oracle re-derives identical Z-values with the same operators).
  * Quantization bounds are caller-provided plan-time constants: derive
  * them from domain knowledge or a stats pass; baking an automatic
  * min/max subquery into the expression would force a second scan of
  * the table inside every write.
  */
object ZOrder {

  /** Quantize `c` (long domain) from [min, max] onto [0, 2^bits) by
    * fixed-step floor division with clamping. The step is computed
    * driver-side (`floor(span / 2^bits) + 1`, which guarantees the
    * quantized value stays below 2^bits); the row-side arithmetic is the
    * shared exact integral floor division ([[RangeJoin.floorDiv]]) — no
    * double detour, no span limit. `max - min` must not overflow a long
    * (i.e. the domain can span at most the positive long range).
    */
  def quantize(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"quantize: bits must be in [1,20], got $bits")
    require(max > min, s"quantize: empty domain [$min, $max]")
    val span = max - min
    require(span > 0, s"quantize: domain [$min, $max] overflows a long span")
    val step = (span >> bits) + 1L
    val clamped = least(greatest(c, lit(min)), lit(max))
    RangeJoin.floorDiv(clamped - lit(min), step)
  }

  /** Bit-interleave quantized coordinates (round-robin, first column in
    * the lowest bit) into one Z-value. `bits` per coordinate; total bits
    * = bits * n must stay < 63.
    */
  def interleave(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "interleave: need at least one coordinate")
    require(bits * coords.length < 63,
      s"interleave: ${coords.length} coords x $bits bits exceeds a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- coords.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * coords.length + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value of `cols` quantized by the given (min, max) bounds. */
  def zValue(cols: Seq[Column], bounds: Seq[(Long, Long)], bits: Int = 16): Column = {
    require(cols.length == bounds.length, "zValue: one (min,max) per column")
    interleave(cols.zip(bounds).map { case (c, (lo, hi)) => quantize(c, lo, hi, bits) }, bits)
  }

  /** Range-sort the frame by the Z-value of `cols` — the write-side
    * layout step. Files written from the result carry tight min/max
    * envelopes on every z-ordered column.
    */
  def zorderSort(df: DataFrame, cols: Seq[Column], bounds: Seq[(Long, Long)],
      bits: Int = 16): DataFrame =
    df.orderBy(zValue(cols, bounds, bits).asc)
}
