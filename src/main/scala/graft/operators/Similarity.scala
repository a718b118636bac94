package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k, a broadcast-join + window.
  *    Correctness baseline; O(|queries| * |corpus|).
  *  - [[lshTopK]] — random-hyperplane LSH bucketing (the 100 TB path):
  *    candidates come from an equi-join on bucket ids (optionally
  *    multi-probe over neighboring buckets), then exact re-ranking of the
  *    tiny candidate set. The quadratic term never materializes.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query row.
    *
    * @param corpus  (id, vec) DataFrame
    * @param queries (id, vec) DataFrame — broadcast when small
    * @param k       neighbors per query (self-matches excluded)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec")))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cvec"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed by an
    * `nBits` random-hyperplane signature; candidates share a bucket; exact
    * cosine re-ranks within buckets. Recall grows with fewer bits or with
    * multi-probe (`probeHammingRadius = 1` also probes buckets differing in
    * one bit). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 8,
      probeHammingRadius: Int = 0,
  ): DataFrame = {
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cvec"),
      cosineLshBucket(col("vec"), nBits).as("bucket"))
    val qBase = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      cosineLshBucket(col("vec"), nBits).as("bucket0"))
    val probes: Column =
      if (probeHammingRadius <= 0) array(col("bucket0"))
      else array(col("bucket0") +: (0 until nBits).map(b =>
        col("bucket0").bitwiseXOR(lit(1L << b))): _*)
    val q = qBase.select(col("query_id"), col("qvec"), explode(probes).as("bucket"))

    val scored = q.join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-bucketed
    * (both sides bucketed once; only intra-bucket pairs verified). */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double, nBits: Int = 8): DataFrame = {
    val b = df.select(col("id"), col("vec"), cosineLshBucket(col("vec"), nBits).as("bucket"))
    b.as("l").join(b.as("r"), Seq("bucket"))
      .filter(col("l.id") < col("r.id"))
      .withColumn("cosine", cosine(col("l.vec"), col("r.vec")))
      .filter(col("cosine") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cosine"))
      .distinct()
  }
}
