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
    * double before multiply, so float inputs are exact). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0.0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplane component for LSH: a value in
    * [-0.5, 0.5) derived from a portable hash of (plane, dim). No RNG state —
    * reproducible across runs, executors, and engines. */
  def hyperplaneComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", lit("hp"), lit(plane), dim)), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) - lit(0.5)

  /** Sign bit of `v . hyperplane(plane)` — one bit of a random-hyperplane
    * (SimHash-style) LSH signature for cosine similarity. */
  def hyperplaneBit(v: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") * hyperplaneComponent(plane, i)),
      lit(0.0),
      (acc, x) => acc + x,
    )
    when(proj >= 0.0, lit(1)).otherwise(lit(0))
  }

  /** nBits-bit random-hyperplane LSH bucket id for cosine similarity: vectors
    * in the same bucket are near-duplicate candidates. Bucket width tunes
    * recall/cost: at 100 TB this is the join key that replaces the quadratic
    * brute-force pair join. */
  def cosineLshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(p => hyperplaneBit(v, p) * lit(1L << p)).reduce(_ + _)
}
