package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter semi-join reduction — the classic 100 TB shuffle
  * lever: when a big fact table joins a much smaller (but not
  * broadcast-small) key set, build a Bloom filter of the small side's
  * join keys and drop non-matching fact rows BEFORE the join's shuffle.
  * The join itself stays exact: Bloom false positives are eliminated by
  * the equi-join, false negatives are impossible, so the reduced join is
  * row-identical to the plain join (spec-checked) — only the shuffled
  * byte volume changes.
  *
  * Spark's AQE injects runtime Bloom filters itself
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when its
  * heuristics fire; this operator is the EXPLICIT form for when they
  * don't — a pre-filtered build side the stats can't see through (a
  * selective theta-filter, a deduped snapshot), or a reduction the
  * caller wants ahead of several downstream stages, built once and
  * reused.
  *
  * Mechanics: the build side hashes keys to `xxhash64` longs and
  * aggregates them into a `spark.util.sketch.BloomFilter` (distributed
  * tree-aggregate, driver holds only the filter's bit array); the probe
  * side evaluates the NATIVE codegen predicate
  * [[BloomFilterMightContain]] (the same expression Spark's runtime
  * filter plants) over the serialized filter literal + `xxhash64(key)` —
  * zero UDFs, whole-stage-codegen friendly.
  */
object BloomJoin {

  private[graft] val MightContainName = "graft_bloom_might_contain"

  private val registered =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  /** Idempotent temp-function registration (the [[graft.functions.VectorExprs]]
    * registry route): `graft_bloom_might_contain(filterBytes, hashedKey)`. */
  def register(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.containsKey(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        MightContainName,
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"$MightContainName expects 2 arguments, got ${exprs.length}")
          BloomFilterMightContain(exprs(0), exprs(1))
        },
        "built-in")
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }

  /** Distributed build: Bloom filter over `xxhash64(key)` of every
    * non-null key row, serialized. NULL keys are excluded (they can
    * never match an equi-join). */
  def buildFilter(
      df: DataFrame,
      key: Column,
      expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"buildFilter: expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"buildFilter: fpp must be in (0, 1), got $fpp")
    val hashed = df.filter(key.isNotNull).select(xxhash64(key).as("_h"))
    val bf = hashed.stat.bloomFilter("_h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The probe predicate: native might-contain over the serialized
    * filter literal and `xxhash64(key)` — matches the build side's
    * insertion convention exactly. Registers against `session` (the probe
    * DataFrame's own session) so a multi-session app never resolves the
    * temp function in the wrong registry; the no-arg overload keeps the
    * thread-local-session convenience for single-session use. */
  def mightContain(filterBytes: Array[Byte], key: Column, session: SparkSession): Column = {
    register(session)
    call_function(MightContainName, lit(filterBytes), xxhash64(key))
  }

  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    mightContain(filterBytes, key, SparkSession.active)

  /** Composite: exact inner equi-join with the big side Bloom-reduced
    * before the shuffle. `big` rows whose key fails the filter never
    * shuffle; the join then removes the fpp-bounded false-positive
    * residue, so the output is row-identical to
    * `big.join(small, keys)`. */
  def semiReducedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    require(keys.nonEmpty, "semiReducedJoin: at least one join key required")
    // composite key: hash the struct of key columns on both sides
    def keyCol(df: DataFrame): Column =
      if (keys.length == 1) df(keys.head) else struct(keys.map(df(_)): _*)
    val bytes = buildFilter(small, keyCol(small), expectedItems, fpp)
    big.filter(mightContain(bytes, keyCol(big), big.sparkSession)).join(small, keys)
  }
}
