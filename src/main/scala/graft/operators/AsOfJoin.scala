package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the nearest-predecessor temporal join Spark
  * has no native operator for. For each left ("probe") row, attaches the
  * payload of the single right ("reference") row whose timestamp is the
  * greatest one <= the probe timestamp (direction "backward"; smallest
  * >= for "forward") within the same key group — the standard way to
  * align a fact stream against slowly-arriving reference points (last
  * quote before a trade, last config before an event, last purchase
  * before a click).
  *
  * Spark-first design: rather than a per-key collect, a range self-join
  * (quadratic in hot keys), or a broadcast of either side, both sides
  * union into one relation tagged by side and a single running
  * `last(payload, ignoreNulls)` window per key in time order carries the
  * latest reference payload forward onto every probe row. Cost at scale:
  * ONE hash-partition shuffle of (|L| + |R|) rows on the key plus a
  * per-key sort — both sides may be fact-sized. Hot keys serialize
  * within their partition, which matches the semantics (an as-of match
  * is inherently a per-key scan in time order); the window frame is
  * running (UNBOUNDED PRECEDING..CURRENT ROW), so Spark evaluates it as
  * an O(1)-per-row streaming frame, never buffering the full partition
  * frame-by-frame.
  */
object AsOfJoin {

  /** @param keys       equi-join key columns present on BOTH sides (non-empty:
    *                   a keyless global as-of would funnel everything into one
    *                   window partition, which is exactly the plan this
    *                   operator exists to avoid)
    * @param leftTs     probe timestamp column on `left` (timestamp or numeric;
    *                   must union-compatibly match `rightTs`'s type)
    * @param rightTs    reference timestamp column on `right`
    * @param direction  "backward" (greatest rightTs <= leftTs, the default),
    *                   "forward" (smallest rightTs >= leftTs), or "nearest"
    *                   (minimum |rightTs - leftTs|; equidistant ties take
    *                   the backward row, pandas merge_asof semantics)
    * @param allowExactMatches whether a reference row AT the probe timestamp
    *                   may match (pandas merge_asof semantics)
    * @param tolerance  optional maximum match distance (an interval literal
    *                   for timestamp domains, numeric otherwise); matches
    *                   farther than this null out instead of matching
    * @param rightPrefix prefix applied to the right payload columns in the
    *                   output (use when names collide with left columns)
    * @return all `left` columns plus the matched right payload columns
    *         (every right column except the keys, including `rightTs` —
    *         callers read the matched timestamp from there); unmatched
    *         probes keep nulls (left-outer semantics)
    *
    * Determinism: several reference rows sharing (key, ts) resolve to the
    * greatest payload struct (field order = right column order). Callers
    * wanting different survivor semantics should pre-aggregate the right
    * side per (key, ts) — which also keeps an oracle like DuckDB's ASOF
    * JOIN (undefined under duplicate timestamps) well-defined.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Column] = None,
      rightPrefix: String = "",
  ): DataFrame = {
    require(keys.nonEmpty, "asOf: keys must be non-empty (a keyless as-of is a single-partition sort)")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asOf: direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    require(rightPayload.nonEmpty, "asOf: right side has no payload columns besides the keys")
    val outRight = rightPayload.map(rightPrefix + _)
    val collisions = outRight.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"asOf: output name collision on ${collisions.mkString(", ")} — set rightPrefix")

    // Union-compatible tagged relation: each side carries its own payload
    // struct and a null of the OTHER side's struct type.
    val lType = left.select(struct(leftCols.map(col): _*).as("s")).schema("s").dataType
    val rType = right.select(struct(rightPayload.map(col): _*).as("s")).schema("s").dataType
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_aoj_ts"),
        struct(leftCols.map(col): _*).as("_aoj_l"),
        lit(null).cast(rType).as("_aoj_r"),
        lit(1).as("_aoj_side")): _*)
    // Equi-join semantics: a reference row with a null key or null
    // timestamp can never match (it would otherwise sort first in the
    // backward scan — nulls-first — and hand its payload to every probe).
    // Null-key/null-ts PROBE rows stay in the output, just unmatched
    // (left-outer semantics); with null references gone they can only
    // share a window partition with other null-key rows, all probes.
    val r2 = right
      .filter(col(rightTs).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("_aoj_ts"),
          lit(null).cast(lType).as("_aoj_l"),
          struct(rightPayload.map(col): _*).as("_aoj_r"),
          lit(0).as("_aoj_side")): _*)

    // Scan order: time order (reversed for "forward" so "next reference"
    // becomes "latest seen"); at equal timestamps the side order decides
    // whether an exact-timestamp reference is visible to the probe row.
    // Each direction is one running window; "nearest" runs both over the
    // SAME union (the hash exchange on the keys is shared — only the two
    // per-partition sorts differ) and picks the closer match per probe.
    def annotate(df: DataFrame, dir: String): DataFrame = {
      val tsOrd = if (dir == "backward") col("_aoj_ts").asc else col("_aoj_ts").desc
      val sideOrd = if (allowExactMatches) col("_aoj_side").asc else col("_aoj_side").desc
      val w = Window
        .partitionBy(keys.map(col): _*)
        .orderBy(tsOrd, sideOrd, col("_aoj_r").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m = last(col("_aoj_r"), ignoreNulls = true).over(w)
      val mts = last(when(col("_aoj_side") === 0, col("_aoj_ts")), ignoreNulls = true).over(w)
      // tolerance gates each direction independently, before any choice
      val ok = tolerance match {
        case Some(tol) =>
          if (dir == "backward") mts >= col("_aoj_ts") - tol
          else mts <= col("_aoj_ts") + tol
        case None => lit(true)
      }
      df.withColumn(s"_aoj_m_$dir", when(ok, m))
        .withColumn(s"_aoj_mts_$dir", when(ok, mts))
    }

    val u = l2.unionByName(r2)
    val gated = direction match {
      case "nearest" =>
        val both = annotate(annotate(u, "backward"), "forward")
        val bw = col("_aoj_m_backward"); val bwTs = col("_aoj_mts_backward")
        val fw = col("_aoj_m_forward"); val fwTs = col("_aoj_mts_forward")
        // backward wins ties (pandas merge_asof picks the earlier row
        // when both sides are equally distant)
        val useBw = bw.isNotNull &&
          (fw.isNull || col("_aoj_ts") - bwTs <= fwTs - col("_aoj_ts"))
        both.withColumn("_aoj_m", when(useBw, bw).otherwise(fw))
      case d => annotate(u, d).withColumnRenamed(s"_aoj_m_$d", "_aoj_m")
    }

    gated
      .filter(col("_aoj_side") === 1)
      // a probe with a null timestamp has no "before"/"after": unmatched
      // (in the forward scan — ts desc, nulls last — it would otherwise
      // see every reference)
      .withColumn("_aoj_m", when(col("_aoj_ts").isNotNull, col("_aoj_m")))
      .select(
        leftCols.map(c => col("_aoj_l").getField(c).as(c)) ++
          rightPayload.zip(outRight).map { case (c, o) => col("_aoj_m").getField(c).as(o) }: _*)
  }

  /** Dimension-table as-of: the fast path when the reference side is
    * small PER KEY (quotes/configs per entity, not another fact stream).
    * The reference collapses to one sorted (ts, payload) array per key;
    * probes equi-join on the key and resolve the match with an array
    * filter — no window, no union, and (critically) it composes with
    * Structured Streaming's stream-STATIC join, where the union+window
    * form of [[asOf]] cannot run (a streaming union side can't be
    * window-sorted). On a batch cluster the key join is broadcast-able
    * when the reference is dimension-sized — zero shuffle of the probe
    * side.
    *
    * Memory contract: one key's references must fit in a single array
    * (executor-memory-bounded). For fact-sized reference sides use
    * [[asOf]]. Semantics (directions, exact-match toggle, tolerance,
    * duplicate-ts greatest-payload tie-break, null hygiene) are
    * IDENTICAL to [[asOf]] — property-tested equal on random data.
    */
  def asOfLookup(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Column] = None,
      rightPrefix: String = "",
  ): DataFrame = {
    require(keys.nonEmpty, "asOfLookup: keys must be non-empty")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asOfLookup: direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    require(rightPayload.nonEmpty, "asOfLookup: right side has no payload columns besides the keys")
    val outRight = rightPayload.map(rightPrefix + _)
    val collisions = outRight.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"asOfLookup: output name collision on ${collisions.mkString(", ")} — set rightPrefix")

    // sorted (t, p) per key; ascending struct order puts the greatest
    // payload last within equal timestamps — same tie-break as asOf
    val rAgg = right
      .filter(col(rightTs).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(rightTs).as("t"),
        struct(rightPayload.map(col): _*).as("p")))).as("_aol_arr"))

    val pts = col(leftTs)
    def pick(dir: String): Column = {
      val elig = dir match {
        case "backward" =>
          val cmp = (e: Column) =>
            if (allowExactMatches) e.getField("t") <= pts else e.getField("t") < pts
          filter(col("_aol_arr"), e => cmp(e))
        case _ =>
          val cmp = (e: Column) =>
            if (allowExactMatches) e.getField("t") >= pts else e.getField("t") > pts
          filter(col("_aol_arr"), e => cmp(e))
      }
      val tolGated = tolerance match {
        case Some(tol) =>
          if (dir == "backward") filter(elig, e => e.getField("t") >= pts - tol)
          else filter(elig, e => e.getField("t") <= pts + tol)
        case None => elig
      }
      // try_element_at: an empty eligible array is "no match" (NULL), not
      // an ANSI index error
      if (dir == "backward") try_element_at(tolGated, lit(-1))
      else {
        // smallest eligible ts, but greatest payload among its ties
        val minT = try_element_at(tolGated, lit(1)).getField("t")
        try_element_at(filter(tolGated, e => e.getField("t") === minT), lit(-1))
      }
    }
    val matched = direction match {
      case "nearest" =>
        val bw = pick("backward"); val fw = pick("forward")
        when(bw.isNotNull && (fw.isNull || pts - bw.getField("t") <= fw.getField("t") - pts), bw)
          .otherwise(fw)
      case d => pick(d)
    }

    left.join(rAgg, keys, "left")
      .withColumn("_aol_m", when(pts.isNotNull && col("_aol_arr").isNotNull, matched))
      .select(
        leftCols.map(col) ++
          rightPayload.zip(outRight).map { case (c, o) =>
            col("_aol_m").getField("p").getField(c).as(o)
          }: _*)
  }
}
