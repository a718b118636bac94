package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two parquet encodings across testdata
  * generations: INT64 TIMESTAMP(NANOS) (which Spark's reader only accepts
  * as a raw nanosecond long under `legacy.parquet.nanosAsLong`) and plain
  * TIMESTAMP micros. The loader branches on the POST-READ type of `ts`
  * rather than assuming either encoding, so a regeneration that flips the
  * encoding again cannot break every events-table query (which is exactly
  * what happened between rounds 5 and 6). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  /** Fact tables worth redistributing when the scan under-splits; the five
    * dimension tables stay scan-shaped (they broadcast anyway). */
  private val factTables = Set("orders", "lineitem", "events", "documents", "embeddings")

  /** Estimated scan split count from the file listing alone — a pure
    * metadata probe (the previous `df.rdd.getNumPartitions` forced a
    * plan->RDD conversion on every fact-table load). Mirrors Spark's own
    * split sizing (`FilePartition.maxSplitBytes`): maxSplitBytes =
    * min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism)),
    * so a single 100 MB file on 32 cores estimates ~25 splits (as the real
    * scan yields), not 1 — without the shrink-to-parallelism term the
    * guard would bolt a full-table repartition onto healthy scans. */
  private def estimatedSplits(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sessionState.conf
    val it = fs.listFiles(p, true)
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) sizes += f.getLen
    }
    val openCost = conf.filesOpenCostInBytes
    val totalBytes = sizes.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, spark.sparkContext.defaultParallelism)
    val maxSplit = math.max(1L,
      math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore)))
    sizes.map(s => math.max(1L, (s + maxSplit - 1) / maxSplit)).sum
  }

  /** Scale-aware parallelism guard. The driver's test parquet has a SINGLE
    * row group per file, so a scan yields one input split no matter the
    * split config, serializing every CPU-heavy projection above it (the
    * shingle/minhash family most of all). When the scan's split count sits
    * far below the cluster parallelism, redistribute once — a few MB of
    * shuffle here, and Catalyst still pushes filters and column pruning
    * BELOW the exchange (verified in plan: PushedFilters on the scan, then
    * Exchange). On production inputs (many row groups / many files) splits
    * >= parallelism, so this is a no-op and plans stay pure scans. */
  private def withScanParallelism(spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (estimatedSplits(spark, path) * 2 < target) df.repartition(target) else df
  }

  /** True when the read failed because of an unsupported TIMESTAMP(NANOS)
    * parquet column (Spark's refusal message names the NANOS unit). */
  private def isNanosRefusal(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("NANOS") || Option(e.getCause).exists(isNanosRefusal)
  }

  /** Encoding-robust events reader; see object scaladoc. The nanos branch
    * truncates ns->us with exact integer division (`div`), matching DuckDB's
    * ns->us truncation bit-for-bit. The legacy `nanosAsLong` conf is set on
    * an ISOLATED child session (`newSession`: shared SparkContext, own
    * SQLConf) that only this relation captures — the caller's session conf
    * is never mutated, so a later TIMESTAMP(NANOS) column in any OTHER
    * table still fails loudly instead of silently loading as raw longs. */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    val df =
      try spark.read.parquet(path)
      catch {
        case e: Exception if isNanosRefusal(e) =>
          val nanosSession = spark.newSession()
          nanosSession.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          // newSession() isolates the FUNCTION REGISTRY too: any query
          // using a native temp function (kmv_sketch, topk_ids, the
          // codegen kernels) would hit UNRESOLVED_ROUTINE when analyzed
          // against this frame's session — register them all up front so
          // an encoding flip still cannot break an events-table query
          graft.functions.GraftFunctions.ensureRegistered(nanosSession)
          nanosSession.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType =>
        // nanos read as raw longs (isolated session above, or the caller's
        // own session already had the legacy conf on)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other (expected TIMESTAMP or INT64 nanos)")
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val raw =
      if (name == "events") loadEvents(spark, path)
      else spark.read.parquet(path)
    if (factTables(name)) withScanParallelism(spark, path, raw) else raw
  }
}
