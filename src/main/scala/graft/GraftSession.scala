package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-aware defaults.
  *
  * Sizing rationale (100 TB target; see README "Design for 100 TB"):
  *  - `shuffle.partitions` follows available parallelism locally; on a real
  *    cluster set it so a shuffle partition is 100-200 MB
  *    (100 TB input with ~3x reduction => O(200k) partitions, so AQE
  *    coalescing from a high initial number is the right mode — we set
  *    `adaptive.coalescePartitions.enabled` and leave the initial count
  *    high rather than hand-tuning).
  *  - `files.maxPartitionBytes` 128 MB keeps scan tasks within executor
  *    memory even with wide nested spectrum rows.
  *  - AQE on: per-assay PSM counts vary 815 -> 800,790 in the reference
  *    corpus (BASELINE.md) — exactly the skew AQE re-plans
  *    (skewJoin.enabled for the band-bucket joins).
  *  - ANSI stays on (Spark 4 default): casts on untrusted strings are
  *    rlike-guarded in the engine instead.
  */
object GraftSession {

  def builder(appName: String, master: Option[String] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // Static conf, default 100: a long-lived session replaying many
      // distinct plans thrashes the generated-class cache and re-pays
      // Janino compilation on every replay (measured 342.9->272.5 s on
      // the 285-query suite when sized; see Bench.scala). Production
      // sessions inherit the same fix as the bench/verify mains.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
    master.orElse(sys.env.get("SPARK_MASTER")).map(b.master).getOrElse(b)
  }

  def local(appName: String, threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(appName, Some(s"local[$threads]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
