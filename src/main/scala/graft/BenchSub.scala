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
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    // A/B conf overlay for optimization experiments:
    // SPARK_GRAFT_CONF="k=v;k=v" (semicolon-separated).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => }
    // Demo-DAG warmup mirrors Bench so pipeline_* subset runs don't charge
    // the shared memo build to the first query measured.
    if (sys.env.get("SPARK_GRAFT_SUBBENCH_WARMUP").contains("1"))
      try graft.pipeline.DemoAssay.warmup(spark)
      catch { case e: Throwable => System.err.println(s"[subbench] warmup failed: ${e.getMessage}") }
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        val c0 = osBean.getProcessCpuTime
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"SUBBENCH $name run$i=$wall%.2f cpu=$cpu%.2f")
        System.gc()
      }
    }
    graft.pipeline.DemoAssay.releaseIndex(spark)
    spark.stop()
  }
}
