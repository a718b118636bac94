package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale audit for the round-13 operators (the QuotaBench
  * discipline — one JVM, doubling sizes, min-of-2 runs):
  *
  *  - `psample`: [[graft.operators.Curation.prioritySample]] over n rows
  *    (expect ~linear: one TakeOrdered scan + bounded tail);
  *  - `pca`: the full [[graft.operators.Pca]] chain over n 64-dim
  *    vectors — scatter (n·2080 integer products, map-side combined),
  *    4 power steps on the collected 64×64, projection fold (expect
  *    ~linear, product-explode dominated);
  *  - `kcore`: [[graft.operators.Graph.kCore]] on a planted quad graph
  *    (80% 4-cliques survive, 20% 4-paths peel in 2 synchronous rounds)
  *    with ~1.35·n edges (expect ~linear: bounded peel depth × one
  *    equi-join shuffle per round).
  *
  *   SPARK_GRAFT_R13_SIZES=1000000,2000000 sbt "runMain graft.Round13Bench"
  */
object Round13Bench {

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SPARK_GRAFT_R13_SIZES", "1000000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[A](f: => A): (A, Double, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      (r, (System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    def minOf2(f: => Unit): (Double, Double) = {
      val runs = (1 to 2).map(_ => time(f))
      (runs.map(_._2).min, runs.map(_._3).min)
    }

    val rows = sizes.map { n =>
      // ---- priority sample over n weighted rows
      val docs = spark.range(n).select(col("id"),
        (pmod(xxhash64(col("id")), lit(97)) + lit(1)).cast("long").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val (wPs, cPs) = minOf2 {
        graft.operators.Curation.prioritySample(docs, col("id"), col("w"), 10000L)
          .agg(count(lit(1)), sum(col("est_weight")))
          .write.format("noop").mode("overwrite").save()
      }
      docs.unpersist()

      // ---- PCA chain over n/5 synthetic 64-dim vectors (the explode is
      // 2080x per row — n/5 keeps the stage in the same wall budget)
      val nv = n / 5
      val vecs = spark.range(nv).select(col("id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("id") * lit(64) + j), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0)).cast("float")).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val (wPca, cPca) = minOf2 {
        import graft.operators.Pca
        val dir = Pca.principalDirectionFixedPoint(
          Pca.collectScatter(Pca.scaledScatter(vecs, col("embedding"), 64), 64), iters = 4)
        Pca.projectPrincipal(vecs, col("id"), col("embedding"), dir)
          .agg(count(lit(1)), sum(col("score_fp")))
          .write.format("noop").mode("overwrite").save()
      }
      vecs.unpersist()

      // ---- 2-core on the planted quad graph (~1.35n edges over n nodes)
      val quads = spark.range(n / 4)
      val clique = array(
        struct(lit(0).as("a"), lit(1).as("b")), struct(lit(0).as("a"), lit(2).as("b")),
        struct(lit(0).as("a"), lit(3).as("b")), struct(lit(1).as("a"), lit(2).as("b")),
        struct(lit(1).as("a"), lit(3).as("b")), struct(lit(2).as("a"), lit(3).as("b")))
      val path = array(
        struct(lit(0).as("a"), lit(1).as("b")), struct(lit(1).as("a"), lit(2).as("b")),
        struct(lit(2).as("a"), lit(3).as("b")))
      val edges = quads
        .select(col("id").as("g"),
          explode(when(pmod(col("id"), lit(5)) === 0, path).otherwise(clique)).as("e"))
        .select((col("g") * 4 + col("e.a")).as("id_a"), (col("g") * 4 + col("e.b")).as("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      val (wKc, cKc) = minOf2 {
        graft.operators.Graph.kCore(edges, k = 2)
          .agg(count(lit(1)), sum(col("core_degree")))
          .write.format("noop").mode("overwrite").save()
      }
      edges.unpersist()

      f""""$n":{"psample_wall":$wPs%.1f,"psample_cpu":$cPs%.1f,"pca_wall":$wPca%.1f,"pca_cpu":$cPca%.1f,"kcore_wall":$wKc%.1f,"kcore_cpu":$cKc%.1f}"""
    }
    println(s"""{"metric":"round13_bench",${rows.mkString(",")}}""")

    // Optional standalone PCA stage (round-14): SPARK_GRAFT_PCA_NVECS=10000000
    // runs the full chain at 10M rows — past the r13 BIGINT landing
    // horizon (|S| <= 2·(n·qmax)² = 2e20 at n = 1e7, over 2^63), so this
    // stage COMPLETING is the proof the DECIMAL(38,0) end-to-end scatter
    // computes where the old guard refused.
    sys.env.get("SPARK_GRAFT_PCA_NVECS").map(_.toLong).foreach { nv =>
      val vecs = spark.range(nv).select(col("id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("id") * lit(64) + j), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0)).cast("float")).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val (wPca, cPca) = minOf2 {
        import graft.operators.Pca
        val dir = Pca.principalDirectionFixedPoint(
          Pca.collectScatter(Pca.scaledScatter(vecs, col("embedding"), 64), 64), iters = 4)
        Pca.projectPrincipal(vecs, col("id"), col("embedding"), dir)
          .agg(count(lit(1)), sum(col("score_fp")))
          .write.format("noop").mode("overwrite").save()
      }
      vecs.unpersist()
      println(f"""{"metric":"round14_pca_decimal","nvecs":$nv,"pca_wall":$wPca%.1f,"pca_cpu":$cPca%.1f}""")
    }
    spark.stop()
  }
}
