package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sourceQuota scale audit (round-13, the r12 ChainBench watch-item):
  * times the operator ISOLATED at a doubling series of input sizes on
  * the ChainBench source shape (16 sources by id), plus the decomposed
  * terms, to name the dominant cost:
  *
  *  - `offsets`: the per-(source, bucket) token subtotal agg + the
  *    <=256-row per-source prefix window;
  *  - `full`: the complete operator (offsets + the tagged<->offsets
  *    equi-join + the within-bucket cumulative window).
  *
  * The join is the suspect: offsets is |sources| x 256 rows (tiny at 16
  * sources), but Catalyst cannot see that through the window, so a
  * sort-merge join re-sorts the whole fact side by (source, _bkt) on
  * top of the window's own (source, _bkt) exchange.
  *
  *   SPARK_GRAFT_QUOTA_SIZES=1000000,2000000,4000000 sbt "runMain graft.QuotaBench"
  */
object QuotaBench {

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SPARK_GRAFT_QUOTA_SIZES", "1000000,2000000,4000000")
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

    val rows = sizes.map { n =>
      // the ChainBench post-dedup shape: (id, src s0..s15, n_tokens ~60)
      val src = spark.range(n).select(col("id"),
        concat(lit("s"), col("id") % 16).as("src"),
        (pmod(xxhash64(col("id")), lit(21)) + lit(50)).cast("long").as("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      src.count()
      val quota = n * 60 / 32 // ~half of a source's expected mass

      // decomposed term: offsets only (agg + tiny per-source window)
      val (_, wOff, cOff) = time {
        val tagged = src
          .select(col("id"), col("src").as("source"), col("n_tokens"))
          .withColumn("_pri", md5(col("id").cast("string")))
          .withColumn("_bkt", conv(substring(col("_pri"), 1, 2), 16, 10).cast("int"))
        tagged.groupBy(col("source"), col("_bkt"))
          .agg(sum(col("n_tokens")).as("_bt"))
          .groupBy(col("source")).agg(count(lit(1)).as("nb"), sum(col("_bt")).as("t"))
          .write.format("noop").mode("overwrite").save()
      }
      // full operator, twice (min: JIT/codegen off the clock)
      val runs = (1 to 2).map { _ =>
        time {
          Curation.sourceQuota(src, col("src"), col("id"), col("n_tokens"), quota)
            .filter(col("admitted"))
            .agg(count(lit(1)), sum(col("n_tokens")))
            .write.format("noop").mode("overwrite").save()
        }
      }
      val (wFull, cFull) = (runs.map(_._2).min, runs.map(_._3).min)
      src.unpersist()
      f""""$n":{"offsets_wall":$wOff%.1f,"offsets_cpu":$cOff%.1f,"full_wall":$wFull%.1f,"full_cpu":$cFull%.1f}"""
    }
    println(s"""{"metric":"quota_bench","sizes":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
