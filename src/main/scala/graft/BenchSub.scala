package graft

import org.apache.spark.sql.SparkSession

/** Subset benchmark for local iteration: times a comma-separated list of
  * SparkEntry queries (same session config and noop-sink materialization
  * as [[Bench]]), printing one `SUBBENCH name=sec` line per repeat. */
object BenchSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => }
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"SUBBENCH $name run$i=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    graft.pipeline.DemoAssay.releaseIndex(spark)
    spark.stop()
  }
}
