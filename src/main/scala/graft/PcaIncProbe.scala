package graft

import graft.operators.Pca
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway breakdown probe for the IncrementalChainBench pca stage —
  * times each sub-step of the incremental path separately to find where
  * the wall goes (the composed stage read 57 s for a 100k increment,
  * ~7x what the row count predicts). */
object PcaIncProbe {
  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BASE", "1000000").toLong
    val nInc = sys.env.getOrElse("SPARK_GRAFT_INC", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vecsFor(ids: org.apache.spark.sql.DataFrame) =
      ids.select(col("id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(col("id") * 64 + d), lit(2000)).cast("double") / lit(1000.0)
            - lit(1.0))).cast("float")).as("vec"))
    val baseVecs = vecsFor(spark.range(nBase).select(col("id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incVecs = vecsFor(spark.range(nBase, nBase + nInc).select(col("id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    baseVecs.count(); incVecs.count()
    val root = java.nio.file.Files.createTempDirectory("pcaprobe").toString
    def time(tag: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("base_stats_write") {
      val (p, c) = Pca.scatterStats(baseVecs, col("vec"), 64)
      p.write.mode("overwrite").parquet(s"$root/pairs")
      c.write.mode("overwrite").parquet(s"$root/comps")
    }
    time("inc_pairs_agg_only") {
      Pca.scatterStats(incVecs, col("vec"), 64)._1.write.format("noop").mode("overwrite").save()
    }
    time("inc_comps_agg_only") {
      Pca.scatterStats(incVecs, col("vec"), 64)._2.write.format("noop").mode("overwrite").save()
    }
    time("merged_collect") {
      val baseStats = (spark.read.parquet(s"$root/pairs"), spark.read.parquet(s"$root/comps"))
      Pca.collectScatter(Pca.scatterFromStats(
        Pca.mergeStats(baseStats, Pca.scatterStats(incVecs, col("vec"), 64))), 64)
    }
    time("full_inc_path") {
      val baseStats = (spark.read.parquet(s"$root/pairs"), spark.read.parquet(s"$root/comps"))
      val dir = Pca.principalDirectionFixedPoint(Pca.collectScatter(Pca.scatterFromStats(
        Pca.mergeStats(baseStats, Pca.scatterStats(incVecs, col("vec"), 64))), 64), iters = 4)
      Pca.projectPrincipal(incVecs, col("id"), col("vec"), dir)
        .agg(sum(col("score_fp"))).collect()
    }
    spark.stop()
  }
}
