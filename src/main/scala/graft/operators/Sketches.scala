package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory cardinality sketches. At 100 TB an exact COUNT(DISTINCT)
  * shuffles every distinct value; a KMV (k-minimum-values) sketch answers
  * the same question from the k smallest hash values — O(k) state per
  * partition, k rows per partition over the wire, and nothing else.
  *
  * The hash is the engine-portable md5-prefix ([[TextFunctions.portableHash32]],
  * uniform on [0, 2^32)), so the WHOLE sketch — hash, k-min set, and
  * estimator — re-derives bit-identically in DuckDB SQL: this is the rare
  * approximate operator with an exact cross-engine oracle (Spark's own
  * `approx_count_distinct` HLL± can never be checked that way).
  *
  * Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07): with U(k) the k-th smallest
  * hash normalized to (0,1], E[distinct] ≈ (k-1)/U(k); when fewer than k
  * distinct hashes exist the sketch IS the exact distinct set.
  */
object Sketches {

  /** The k smallest DISTINCT portable hashes of `c` (column "h", ≤ k rows).
    *
    * Per-partition bounded TreeSet via `mapPartitions` — the one shape
    * Spark's declarative API cannot express (a distinct-respecting
    * bounded top-k without shuffling the full distinct set). Each task
    * emits at most k longs; the merge input is bounded by k × partitions
    * rows, so the final distinct+sort is metadata-sized at any corpus
    * scale.
    */
  def kmvMinHashes(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmvMinHashes: k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df
      .select(TextFunctions.portableHash32(c.cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .as[Long]
    val partial = hashes.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach(h => graft.functions.BoundedSets.keepSmallest(set, java.lang.Long.valueOf(h), k))
      import scala.jdk.CollectionConverters._
      set.iterator().asScala.map(_.longValue())
    }
    partial.toDF("h").distinct().orderBy("h").limit(k)
  }

  /** One-row distinct-count estimate for `c`: (column_name, k, n_kmv,
    * kth_hash, estimate). `n_kmv < k` means the sketch saw the whole
    * distinct set and `estimate` is exact.
    */
  def kmvDistinct(df: DataFrame, name: String, c: Column, k: Int): DataFrame =
    kmvMinHashes(df, c, k)
      .agg(count(lit(1)).as("n_kmv"), max(col("h")).as("kth_hash"))
      .select(
        lit(name).as("column_name"),
        lit(k).as("k"),
        col("n_kmv"),
        col("kth_hash"),
        when(col("n_kmv") < k, col("n_kmv").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("kth_hash").cast("double"))
          .as("estimate"))

  /** Fixed-memory approximate quantiles for a LONG-domain column via a
    * fixed-step histogram: one distributed aggregate over
    * floor(v / step) buckets, a cumulative count over the (small) bucket
    * table, and quantile selection — state is O(domain / step)
    * regardless of row count, vs the full-width sort state of an exact
    * percentile. Error is bounded by the bucket: the reported midpoint
    * is within step/2 of a true q-quantile element.
    *
    * The cumulative count runs as a bounded theta self-join over the
    * bucket table (no unpartitioned window — the bucket table is small
    * by construction, O(B²) pairs where B = span/step; size `step` so B
    * stays in the thousands). Bit-exact cross-engine: bucket arithmetic
    * is integral, the q*total threshold and midpoint math replay
    * identically in DuckDB.
    *
    * @return one row per q: (q, bucket, approx) with
    *         approx = bucket*step + step/2 (long midpoint)
    */
  def histogramQuantiles(df: DataFrame, c: Column, step: Long, qs: Seq[Double]): DataFrame = {
    require(step > 0, s"histogramQuantiles: step must be positive, got $step")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"histogramQuantiles: quantiles must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = df
      .filter(c.isNotNull)
      .select(RangeJoin.floorDiv(c, step).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val cum = buckets.as("a")
      .join(buckets.as("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.n")).as("cum"))
    val total = buckets.agg(sum(col("n")).as("total"))
    qs.toDF("q")
      .crossJoin(total)
      .join(cum, col("cum") >= col("q") * col("total"))
      .groupBy(col("q")).agg(min(col("bucket")).as("bucket"))
      .select(col("q"), col("bucket"),
        (col("bucket") * lit(step) + lit(step / 2)).as("approx"))
  }

  /** Per-GROUP distinct-count estimate via the native
    * [[graft.functions.KmvSketchAgg]] aggregate: one row per group with
    * (n_kmv, kth_hash, estimate). The partial buffers cap at k longs per
    * (partition, group), so a hot group can never blow the aggregation
    * buffer the way `collect_set` would. Groups whose values are all
    * null report an empty sketch (n_kmv 0, estimate 0.0).
    */
  def kmvDistinctByGroup(df: DataFrame, groupCols: Seq[Column], c: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    val h = TextFunctions.portableHash32(c.cast("string"))
    df.groupBy(groupCols: _*)
      .agg(graft.functions.KmvSketchAgg.kmvSketch(spark, h, k).as("_sk"))
      .withColumn("n_kmv", col("_sk.n_kmv"))
      .withColumn("kth_hash", col("_sk.kth_hash"))
      .withColumn("estimate", col("_sk.estimate"))
      .drop("_sk")
  }

  /** Per-group Count-Min frequency sketch via the native
    * [[graft.functions.CountMinAgg]] aggregate: one row per group with
    * (total, counters[depth*width]). The frequency complement of
    * [[kmvDistinctByGroup]] — bounded depth×width state per (partition,
    * group) no matter how many distinct values the column holds. */
  def cmsSketchByGroup(
      df: DataFrame, groupCols: Seq[Column], c: Column,
      depth: Int, width: Int): DataFrame = {
    val spark = df.sparkSession
    val h = TextFunctions.portableHash32(c.cast("string"))
    df.groupBy(groupCols: _*)
      .agg(graft.functions.CountMinAgg.cmsSketch(spark, h, depth, width).as("_sk"))
      .withColumn("total", col("_sk.total"))
      .withColumn("counters", col("_sk.counters"))
      .drop("_sk")
  }

  /** Join-cardinality estimate from two CMS sketches (the inner-product
    * estimator, Cormode & Muthukrishnan 2005): |A ⋈_k B| = Σ_k cA(k)·cB(k),
    * estimated as min over rows r of Σ_b cmsA[r][b]·cmsB[r][b]. Always an
    * OVERestimate (collision mass only adds), with additive error
    * ~|A|·|B|/width per row — size `width` to |A|·|B|/tolerable_error.
    *
    * The planner-side use: decide salting/broadcast/bucketing for an
    * expensive join from two bounded sketches WITHOUT running the join —
    * each side is one map-side-combined aggregation, and the estimate is
    * a pure column over the two counter arrays (exact BIGINT arithmetic:
    * bit-identical on any engine, any partitioning). */
  def cmsJoinSizeEstimate(
      countersA: Column, countersB: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= graft.functions.CountMinAgg.MaxDepth,
      s"cmsJoinSizeEstimate: depth must be in [1, ${graft.functions.CountMinAgg.MaxDepth}], got $depth")
    require(width >= 1, s"cmsJoinSizeEstimate: width must be >= 1, got $width")
    val rows = (0 until depth).map { r =>
      val a = slice(countersA, r * width + 1, width)
      val b = slice(countersB, r * width + 1, width)
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    }
    if (rows.size == 1) rows.head else least(rows: _*)
  }

  /** Point query against an evaluated CMS `counters` array for the value
    * in `c`: the minimum of the value's d counters — a pure codegen
    * column (`least` over `element_at`s), never an action. Guaranteed
    * >= the true count; NULL for a NULL value. */
  def cmsEstimate(counters: Column, c: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= graft.functions.CountMinAgg.MaxDepth,
      s"cmsEstimate: depth must be in [1, ${graft.functions.CountMinAgg.MaxDepth}], got $depth")
    require(width >= 1, s"cmsEstimate: width must be >= 1, got $width")
    val h = TextFunctions.portableHash32(c.cast("string"))
    val reads = (0 until depth).map { r =>
      element_at(counters,
        (lit(r.toLong * width) + graft.functions.CountMinAgg.bucketCol(h, r, width) + lit(1L))
          .cast("int"))
    }
    val est = if (reads.size == 1) reads.head else least(reads: _*)
    // explicit NULL gate: a NULL value must yield a NULL estimate even
    // after constant folding (a folded NullType-literal read has been
    // observed to surface as 0 through an aggregate's result projection)
    when(h.isNotNull, est)
  }
}
