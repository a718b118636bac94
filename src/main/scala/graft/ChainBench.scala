package graft

import graft.functions.TextFunctions
import graft.operators.{CorpusPipeline, Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flagship-chain scale probe (round-12): the full curation pipeline a
  * training-data job actually runs, COMPOSED end-to-end — each stage
  * consumes the previous stage's survivors, not the raw input — at
  * millions of documents:
  *
  *   synthesize -> buildCorpus (quality + langid + exact dedup +
  *   MinHash-LSH near-dup CC) -> applySubstringDedup (ExactSubstr
  *   removal) -> sourceQuota (hard per-source token cap) ->
  *   componentSplit (leakage-safe train/val/test) -> trainingShardPlan
  *   (epoch shuffle + shards + greedy token packs)
  *
  * [[CorpusBench]] times the same operators ISOLATED on the raw corpus;
  * this probe times the composition, where each stage sees the previous
  * stage's (smaller, already-deduped) output and the interesting failure
  * mode is a stage whose cost does NOT shrink with its input — that
  * would read as super-linear in the per-stage table recorded in
  * PLANS.md. Per-stage wall AND process-CPU are printed (the r6 lesson:
  * wall inflates under box contention, CPU barely moves).
  *
  *   SPARK_GRAFT_NDOCS=2000000 sbt "runMain graft.ChainBench"
  */
object ChainBench {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The CorpusBench synthetic corpus: ~60-token docs over a 1k-word
    // vocabulary, every 10th a near-duplicate of its predecessor and
    // every 50th an exact duplicate, 16 sources by id — planted work for
    // every dedup stage. Materialized off the clock.
    val vocabSize = 1000
    val docLen = 60
    val base = spark.range(nDocs).select(col("id"))
      .withColumn("toks", transform(sequence(lit(0), lit(docLen - 1)), i =>
        concat(lit("w"), pmod(xxhash64(col("id") * lit(docLen) + i), lit(vocabSize)))))
    val docs = base.select(
      col("id"),
      when(col("id") % 50 === 0 && col("id") > 0,
        concat_ws(" ", transform(sequence(lit(0), lit(docLen - 1)), i =>
          concat(lit("w"), pmod(xxhash64((col("id") - 1) * lit(docLen) + i), lit(vocabSize))))))
        .when(col("id") % 10 === 0 && col("id") > 0,
          concat_ws(" ", concat(lit("mut"), col("id")),
            concat_ws(" ", transform(sequence(lit(1), lit(docLen - 1)), i =>
              concat(lit("w"), pmod(xxhash64((col("id") - 1) * lit(docLen) + i), lit(vocabSize)))))))
        .otherwise(concat_ws(" ", col("toks"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[A](f: => A): (A, Double, Double) = {
      System.gc() // dead blocks from the previous stage stay off this clock
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      (r, (System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }

    // Stage 1: corpus build (quality gate + langid + exact dedup +
    // MinHash-LSH near-dup components). Survivors pinned for stage 2.
    val (corpusN, wBuild, cBuild) = time {
      val r = CorpusPipeline.buildCorpus(
        docs.select(col("id"), col("text")),
        CorpusPipeline.CorpusConfig(minQuality = 0.3, nearDupThreshold = 0.5))
      val pinned = r.corpus.select(col("id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = pinned.count(); r.unpersist(); (pinned, c)
    }
    val (corpus, nCorpus) = corpusN
    docs.unpersist()

    // Stage 2: global cross-document exact-substring dedup, APPLY step —
    // input is the stage-1 survivor set.
    val (cleanedN, wSubstr, cSubstr) = time {
      val pinned = Curation.applySubstringDedup(corpus, col("id"), col("text"), k = 5)
        .select(col("id"), col("clean_text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (pinned, pinned.count())
    }
    val (cleaned, nCleaned) = cleanedN
    corpus.unpersist()

    // Stage 3: hard per-source token quota over the cleaned survivors
    // (16 synthetic sources; cap = half of a source's expected mass so
    // admission genuinely cuts).
    val srcCleaned = cleaned
      .select(col("id"), col("clean_text"), concat(lit("s"), col("id") % 16).as("src"),
        size(TextFunctions.tokens(col("clean_text"))).cast("long").as("n_tokens"))
    val (admittedN, wQuota, cQuota) = time {
      val pinned = Curation.sourceQuota(srcCleaned, col("src"), col("id"),
        col("n_tokens"), quotaTokens = nDocs * docLen / 32)
        .filter(col("admitted")).select(col("id"), col("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (pinned, pinned.count())
    }
    val (admitted, nAdmitted) = admittedN

    // Stage 4: leakage-safe component split over the admitted set — the
    // near-dup pair graph is REBUILT on this stage's own input (the
    // chain's residual near-dups, post stage-1 dedup), then every
    // component lands wholly in one split.
    val admittedDocs = cleaned.join(admitted.select(col("id")), Seq("id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (splitHist, wSplit, cSplit) = time {
      val shingles = admittedDocs.select(col("id"),
        explode(TextFunctions.wordShingles(col("clean_text"), 3)).as("shingle"))
      val sigs = Dedup.minHashSignature(shingles, col("id"), col("shingle"), 16)
      val pairs = Dedup.minHashLshPairs(sigs, 4, 4, 0.5)
      // seed REQUIRED here: stage 3 admitted ids in md5(id) priority
      // order, and a seedless split draws from a prefix of the SAME
      // md5(id) — every admitted row would land in the 80% head split.
      // This correlation is exactly what this composed probe exists to
      // catch (see the hashSplit scaladoc's correlation hazard).
      Curation.componentSplit(admittedDocs.select(col("id")), col("id"), pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "chain")
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .collect().sortBy(_.getString(0))
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",")
    }
    cleaned.unpersist()

    // Stage 5: epoch-shuffled, greedy-packed training shards over the
    // final survivor set.
    val (nPacks, wShards, cShards) = time {
      Curation.trainingShardPlan(admittedDocs, col("id"), col("clean_text"),
        size(TextFunctions.tokens(col("clean_text"))).cast("long"),
        epoch = 1, tokenBudget = 2048, numShards = 64)
        .select(col("shard"), col("pack")).distinct().count()
    }
    admittedDocs.unpersist(); admitted.unpersist()

    val wTotal = wBuild + wSubstr + wQuota + wSplit + wShards
    val cTotal = cBuild + cSubstr + cQuota + cSplit + cShards
    println(
      f"""{"metric":"chain_bench","n_docs":$n,"corpus_survivors":$nCorpus,"cleaned":$nCleaned,"quota_admitted":$nAdmitted,"splits":{$splitHist},"shard_packs":$nPacks,"total_wall":$wTotal%.1f,"total_cpu":$cTotal%.1f,"wall":{"build_corpus":$wBuild%.1f,"substring_dedup_apply":$wSubstr%.1f,"source_quota":$wQuota%.1f,"component_split":$wSplit%.1f,"training_shards":$wShards%.1f},"cpu":{"build_corpus":$cBuild%.1f,"substring_dedup_apply":$cSubstr%.1f,"source_quota":$cQuota%.1f,"component_split":$cSplit%.1f,"training_shards":$cShards%.1f}}""")
    spark.stop()
  }
}
