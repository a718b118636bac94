package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (similarity search / near-dup scale
  * path). Pure `Column` expressions over `ArrayType` columns — sequential
  * left-folds, so results are bit-deterministic and reproducible in the
  * SQL oracle (same fold order => identical IEEE doubles).
  */
object VectorFunctions {

  /** Dot product of two equal-length vectors (element types are cast to
    * double before multiply, so float inputs are exact). Evaluates through
    * the native codegen kernel ([[DotProductExpr]]) — a primitive loop with
    * the same sequential fold order, so values are bit-identical to the
    * higher-order-function form the SQL oracle reproduces.
    *
    * Session caveat: the kernel registers on the THREAD-LOCAL active
    * session at column-build time. A DataFrame owned by a different
    * session (`newSession()` isolates the function registry) can fail
    * analysis with an undefined function — call
    * [[GraftFunctions.ensureRegistered]]`(df.sparkSession)` first (every
    * graft operator entry point already does). */
  def dot(a: Column, b: Column): Column = VectorExprs.dotNative(a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; a zero-norm vector yields 0.0, while a NULL
    * vector / null element / length mismatch propagates NULL (matching
    * the dot kernel's semantics) rather than posing as a real 0.0. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0.0, dot(a, b) / d).otherwise(when(d.isNotNull, lit(0.0)))
  }

  /** Deterministic pseudo-random hyperplane component for LSH: a value in
    * [-0.5, 0.5) derived from a portable md5 hash of (plane, dim index). No
    * RNG state — reproducible across runs, executors, and engines, and
    * data-INDEPENDENT, so the whole matrix constant-folds at plan-build
    * time ([[hyperplaneComponentValue]]) instead of hashing per row. */
  def hyperplaneComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", lit("hp"), lit(plane), dim)), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) - lit(0.5)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Scala-side evaluation of [[hyperplaneComponent]] — bit-identical to the
    * SQL form (same md5-prefix-as-uint32 construction). */
  def hyperplaneComponentValue(plane: Int, i: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"hp:$plane:$i").substring(0, 8), 16)
      .toDouble / 4294967296.0 - 0.5

  /** The plane as a literal vector — zero hashing at runtime. */
  def hyperplaneVector(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(i => hyperplaneComponentValue(plane, i))

  /** Sign bit of `v . hyperplane(plane)` — one bit of a random-hyperplane
    * (SimHash-style) LSH signature for cosine similarity. The projection is
    * the same sequential fold as the dynamic form, so values (and the SQL
    * oracle) are unchanged. */
  def hyperplaneBit(v: Column, plane: Int, dim: Int): Column = {
    val proj = VectorExprs.dotNative(v, typedLit(hyperplaneVector(plane, dim)))
    // NULL/NaN projection (null element, or a vector whose length differs
    // from `dim`) yields a NULL bit — NOT bit 0. An otherwise(0) here
    // folded EVERY mismatched vector into bucket 0, silently collapsing
    // the LSH join into the quadratic cross product it exists to avoid; a
    // NULL bucket instead drops the invalid vector from the candidate
    // equi-join (same excluded-from-candidates contract as a NULL cosine).
    when(proj >= 0.0, lit(1)).when(proj < 0.0, lit(0))
  }

  /** nBits-bit random-hyperplane LSH bucket id for cosine similarity: vectors
    * in the same bucket are near-duplicate candidates. Bucket width tunes
    * recall/cost: at 100 TB this is the join key that replaces the quadratic
    * brute-force pair join. `dim` must match the embedding length (planes
    * are embedded as literal arrays). */
  def cosineLshBucket(v: Column, nBits: Int, dim: Int): Column =
    (0 until nBits).map(p => hyperplaneBit(v, p, dim) * lit(1L << p)).reduce(_ + _)

  /** Deterministic Rademacher (±1) sign for (output dim j, input dim i) —
    * the random-projection matrix entry, derived from the portable
    * md5-prefix scheme (sign = +1 iff the 32-bit prefix's top bit is
    * set), so the whole matrix is data-independent, engine-portable, and
    * constant-folds into literal vectors at plan-build time. */
  def rademacherSignValue(j: Int, i: Int): Double =
    if (java.lang.Long.parseLong(md5Hex(s"rp:$j:$i").substring(0, 8), 16) >= 2147483648L)
      1.0
    else -1.0

  /** Output row j of the Rademacher projection matrix as a literal. */
  def rademacherVector(j: Int, inDim: Int): Array[Double] =
    Array.tabulate(inDim)(i => rademacherSignValue(j, i))

  /** Random-projection (Johnson–Lindenstrauss) dimensionality reduction
    * with a ±1 Rademacher matrix (Achlioptas 2003, "Database-friendly
    * random projections"): y_j = (Σ_i sign(j,i)·x_i) / sqrt(outDim).
    * Distances/angles are preserved in expectation with variance
    * O(1/outDim) — the cheap pre-ANN compaction (64→16 dims = 4× fewer
    * FLOPs and bytes per pair) that needs NO training pass, unlike PCA
    * or PQ codebooks.
    *
    * Determinism/parity: each output component is one native-kernel dot
    * against a LITERAL sign vector (zero per-row hashing; the
    * [[hyperplaneBit]] discipline) times one exactly-rounded scale —
    * the same sequential fold the SQL oracle reproduces, so projected
    * vectors are bit-identical cross-engine. Scale shape: a pure
    * zero-shuffle projection; at 100 TB materialize it once next to the
    * full embedding and scan 4× fewer bytes per similarity query. */
  def randomProjection(v: Column, inDim: Int, outDim: Int): Column = {
    require(inDim >= 1 && outDim >= 1,
      s"randomProjection: dims must be >= 1, got in=$inDim out=$outDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      VectorExprs.dotNative(v, typedLit(rademacherVector(j, inDim))) * lit(scale)
    }: _*)
  }
}
