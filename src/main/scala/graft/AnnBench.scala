package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Similarity-search scale probe: synthesizes N deterministic 64-dim
  * vectors (hash-derived, no RNG) and times the ANN paths — LSH-bucketed
  * top-k, IVF probe-limited top-k, and LSH near-dup pairing — plus the
  * exact brute-force baseline on a small query set. The ANN counterpart
  * of [[CorpusBench]]: evidence the bucketed plans (equi-joins, no
  * quadratic pair space) hold when the embeddings table stops being
  * toy-sized.
  *
  *   SPARK_GRAFT_NVECS=1000000 sbt "runMain graft.AnnBench"
  */
object AnnBench {

  def main(args: Array[String]): Unit = {
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_NVECS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic embeddings in [-0.5, 0.5)^64; every 20th vector is a
    // jittered copy of its predecessor (planted near-neighbors).
    def comp(id: org.apache.spark.sql.Column, i: Int) =
      (pmod(xxhash64(id * lit(dim) + lit(i)), lit(1000000L)).cast("double") /
        lit(1000000.0)) - lit(0.5)
    val base = spark.range(nVecs)
      .select(col("id"), array((0 until dim).map(i => comp(col("id"), i)): _*).as("v0"))
    val vecs = base.select(col("id"),
      when(col("id") % 20 === 0 && col("id") > 0,
        array((0 until dim).map(i =>
          comp(col("id") - 1, i) + lit(if (i == 0) 0.01 else 0.0)): _*))
        .otherwise(col("v0")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val queries = vecs.filter(col("id") < 100)
    val (nBf, tBf) = time {
      Similarity.bruteForceTopK(vecs, queries, 10).count()
    }
    val (nLsh, tLsh) = time {
      Similarity.lshTopK(vecs, queries, k = 10, nBits = 12, dim = dim,
        probeHammingRadius = 1).count()
    }
    val (nIvf, tIvf) = time {
      Similarity.ivfTopK(vecs, queries, k = 10, nCells = 64, nProbe = 4,
        kmeansIters = 3).count()
    }
    val (nPairs, tPairs) = time {
      Similarity.embeddingNearDupPairs(vecs, threshold = 0.99, nBits = 14,
        dim = dim).count()
    }

    println(
      f"""{"metric":"ann_bench","n_vecs":$n,"bf_rows":$nBf,"lsh_rows":$nLsh,"ivf_rows":$nIvf,"neardup_pairs":$nPairs,"sec":{"bruteforce_100q":$tBf%.1f,"lsh_topk_100q":$tLsh%.1f,"ivf_topk_100q":$tIvf%.1f,"neardup_pairs":$tPairs%.1f}}""")
    spark.stop()
  }
}
