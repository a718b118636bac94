package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader refuses; it is read as a nanosecond long
  * (`legacy.parquet.nanosAsLong`) and converted to a microsecond timestamp
  * with exact integer division (`div`), matching DuckDB's ns->us
  * truncation bit-for-bit. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  /** Fact tables worth redistributing when the scan under-splits; the five
    * dimension tables stay scan-shaped (they broadcast anyway). */
  private val factTables = Set("orders", "lineitem", "events", "documents", "embeddings")

  /** Scale-aware parallelism guard. The driver's test parquet has a SINGLE
    * row group per file, so a scan yields one input split no matter the
    * split config, serializing every CPU-heavy projection above it (the
    * shingle/minhash family most of all). When the scan's split count sits
    * far below the cluster parallelism, redistribute once — a few MB of
    * shuffle here, and Catalyst still pushes filters and column pruning
    * BELOW the exchange (verified in plan: PushedFilters on the scan, then
    * Exchange). On production inputs (many row groups / many files) splits
    * >= parallelism, so this is a no-op and plans stay pure scans. */
  private def withScanParallelism(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
    if (factTables(name)) withScanParallelism(spark, raw) else raw
  }
}
