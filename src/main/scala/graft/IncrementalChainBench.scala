package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Hnsw, Pca, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed INCREMENTAL nightly chain at scale (round-14): a 1M-doc
  * standing corpus with its artifacts already persisted (md5 fingerprint
  * store, MinHash signature store, PCA sufficient statistics, sharded
  * NSW index), then a 100k nightly increment driven through EVERY
  * incremental maintenance path — exact dedup against the store,
  * near-dup against the signature store, the PCA axis refreshed by
  * [[Pca.mergeStats]], the ANN index extended by
  * [[Hnsw.insertIntoIndex]] — with each stage timed against its
  * full-recompute twin over base+increment. The claim under test: every
  * incremental stage costs O(increment) (plus bounded artifact IO),
  * never O(history).
  *
  * Planted structure: every 10th increment doc is an exact copy of a
  * base doc (the dedup/near-dup stages must find real cross-batch
  * work); increment vectors sit in 8 offset "topics" so they land in a
  * bounded set of IVF cells — the realistic nightly shape
  * (topically-clustered new content). A uniformly-spread increment
  * would touch every cell and degrade insertIntoIndex toward the full
  * rebuild; that boundary is the operator's documented contract
  * (Hnsw.scala), not a surprise.
  *
  *   SPARK_GRAFT_BASE=1000000 SPARK_GRAFT_INC=100000 \
  *     sbt "runMain graft.IncrementalChainBench"
  */
object IncrementalChainBench {

  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BASE", "1000000").toLong
    val nInc = sys.env.getOrElse("SPARK_GRAFT_INC", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[A](f: => A): (A, Double, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      (r, (System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    // Steady-state timing (min-of-2): the first execution of each stage
    // pays Janino/whole-stage-codegen compilation of the big generated
    // kernels — a CONSTANT per-JVM cost (measured ~40 s for the PCA
    // scatter plan via PcaIncProbe: 107 s cold vs 17 s warm at identical
    // data), not a function of corpus size, so the scale claim under
    // test is about the warm number. Both inc and full twins get the
    // same treatment.
    def time2[A](f: => A): (A, Double, Double) = {
      val (r, w1, c1) = time(f); val (_, w2, c2) = time(f)
      (r, math.min(w1, w2), math.min(c1, c2))
    }

    val root = java.nio.file.Files.createTempDirectory("graft-incchain").toString
    def art(name: String) = s"$root/$name"

    // ---- corpus formulas (the ChainBench synthetic): ~60-token docs
    // over a 1k-word vocabulary; an increment id with id % 10 == 0
    // reuses the text of base doc (id - nBase) — planted cross-batch
    // exact dups the dedup stages must catch.
    val vocabSize = 1000
    val docLen = 60
    def docsFor(ids: org.apache.spark.sql.DataFrame): DataFrame = {
      val eff = when(col("id") >= nBase && col("id") % 10 === 0, col("id") - nBase)
        .otherwise(col("id"))
      ids.select(col("id"),
        concat_ws(" ", transform(sequence(lit(0), lit(docLen - 1)), i =>
          concat(lit("w"), pmod(xxhash64(eff * lit(docLen) + i), lit(vocabSize)))))
          .as("text"))
    }
    // 64-dim vectors; increment rows are JITTERED NEAR-COPIES of 8 base
    // anchor vectors (ids 0..7, jitter <= 0.01 per dim) — tonight's
    // topically-clustered crawl, which lands in the anchors' IVF cells.
    // (The first cut used a +3.0 offset block; nearest-centroid
    // assignment is dominated by the 56 untouched uniform dims, so that
    // increment SPREAD over all 64 cells — v4 measured
    // ann_affected_cells = 64 and no insert win. Clustering must come
    // from proximity to existing structure, not from an offset.)
    def vecsFor(ids: org.apache.spark.sql.DataFrame): DataFrame = {
      val anchor = when(col("id") >= nBase, pmod(col("id"), lit(8))).otherwise(col("id"))
      ids.select(col("id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(anchor * 64 + d), lit(2000)).cast("double") / lit(1000.0)
            - lit(1.0)) +
            when(col("id") >= nBase,
              pmod(xxhash64(col("id") * 64 + d), lit(1000)).cast("double") / lit(100000.0))
              .otherwise(lit(0.0))).cast("float")).as("vec"))
    }

    // The corpus lives in PARQUET, like a real standing corpus: the full
    // recompute twins must RESCAN STORAGE, not a RAM cache (v4's full
    // twins read memory-persisted frames — a 128 GB cache subsidy no
    // 100 TB corpus gets), and the increment arrives as new files.
    val baseIds = spark.range(nBase).select(col("id"))
    val incIds = spark.range(nBase, nBase + nInc).select(col("id"))
    val root0 = java.nio.file.Files.createTempDirectory("graft-incchain-corpus").toString
    docsFor(baseIds).write.mode("overwrite").parquet(s"$root0/docs_base")
    docsFor(incIds).write.mode("overwrite").parquet(s"$root0/docs_inc")
    vecsFor(baseIds).write.mode("overwrite").parquet(s"$root0/vecs_base")
    vecsFor(incIds).write.mode("overwrite").parquet(s"$root0/vecs_inc")
    def baseDocs = spark.read.parquet(s"$root0/docs_base")
    def incDocs = spark.read.parquet(s"$root0/docs_inc")
    def baseVecs = spark.read.parquet(s"$root0/vecs_base")
    def incVecs = spark.read.parquet(s"$root0/vecs_inc")

    def sigs(d: DataFrame): DataFrame = Dedup.minHashSignature(
      d.select(col("id"), explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle")),
      col("id"), col("shingle"), numHashes = 16)

    // ---- standing-corpus artifacts, built ONCE (the nightly job reads
    // these; their build cost amortizes over every night). Timed
    // separately so the artifact-build economics are visible too.
    val (_, wFp, _) = time {
      baseDocs.select(md5(col("text")).as("fp")).write.mode("overwrite").parquet(art("fp"))
    }
    // the dedup prefilter is itself an artifact (round-14 finding:
    // rebuilding it from the fp store every night was the one O(history)
    // cost in the dedup path)
    val (_, wBloom, _) = time {
      Dedup.saveBloom(Dedup.buildSeenBloom(
        spark.read.parquet(art("fp")), col("fp"), expectedSeen = nBase), art("bloom"))
    }
    val (_, wSig, _) = time {
      sigs(baseDocs).write.mode("overwrite").parquet(art("sigs"))
      // the store's band keys are an artifact too (round-14: re-banding
      // the store was ~half the nightly near-dup CPU)
      Dedup.bandKeys(spark.read.parquet(art("sigs")), numBands = 4, rowsPerBand = 4)
        .write.mode("overwrite").parquet(art("sig_bands"))
    }
    val (_, wStats, _) = time {
      val (p, c) = Pca.scatterStats(baseVecs, col("vec"), 64)
      p.write.mode("overwrite").parquet(art("pca_pairs"))
      c.write.mode("overwrite").parquet(art("pca_comps"))
    }
    val cents = Similarity.deterministicCentroids(
      baseVecs.select(col("id"), col("vec")), nCells = 64, iters = 3)
    val (_, wIdx, _) = time {
      // cell-partitioned store: the nightly delta overwrites affected
      // cell partitions; the rebuild's In-predicate read prunes to them
      Hnsw.buildNswIndex(baseVecs, cents, m = 8, efConstruction = 32)
        .write.partitionBy("cell").mode("overwrite").parquet(art("idx"))
    }
    println(f"""{"artifacts":{"fp_store":$wFp%.1f,"bloom":$wBloom%.1f,"sig_store":$wSig%.1f,"pca_stats":$wStats%.1f,"ann_index":$wIdx%.1f}}""")

    // ---- stage 1: exact dedup — increment vs the store (prebuilt bloom
    // artifact; only bloom hits probe the fp store) / full rescan
    val (nNew, wI1, cI1) = time2 {
      Dedup.incrementalDedupWithBloom(incDocs, md5(col("text")),
        spark.read.parquet(art("fp")), col("fp"), Dedup.loadBloom(art("bloom"))).count()
    }
    val (nDistinct, wF1, cF1) = time2 {
      Dedup.exact(baseDocs.unionByName(incDocs), col("id"), md5(col("text"))).count()
    }

    // ---- stage 2: near-dup — increment sigs vs the signature store /
    // full LSH pair table over base+increment
    val (nFlagged, wI2, cI2) = time2 {
      Dedup.incrementalNearDupPrebanded(sigs(incDocs),
        spark.read.parquet(art("sig_bands")), spark.read.parquet(art("sigs")),
        numBands = 4, rowsPerBand = 4, threshold = 0.5)
        .filter(col("near_dup")).count()
    }
    val (nPairs, wF2, cF2) = time2 {
      Dedup.minHashLshPairs(sigs(baseDocs.unionByName(incDocs)),
        numBands = 4, rowsPerBand = 4, threshold = 0.5).count()
    }

    // ---- stage 3: PCA axis — merge persisted base stats with the
    // increment's (dim²-bounded adds) vs a full corpus rescan; both end
    // projecting the increment on the refreshed axis
    val (s3i, wI3, cI3) = time2 {
      val baseStats = (spark.read.parquet(art("pca_pairs")), spark.read.parquet(art("pca_comps")))
      val dir = Pca.principalDirectionFixedPoint(Pca.collectScatter(Pca.scatterFromStats(
        Pca.mergeStats(baseStats, Pca.scatterStats(incVecs, col("vec"), 64))), 64), iters = 4)
      Pca.projectPrincipal(incVecs, col("id"), col("vec"), dir)
        .agg(sum(col("score_fp"))).collect()(0).getLong(0)
    }
    val (s3f, wF3, cF3) = time2 {
      val dir = Pca.principalDirectionFixedPoint(Pca.collectScatter(Pca.scaledScatter(
        baseVecs.unionByName(incVecs), col("vec"), 64), 64), iters = 4)
      Pca.projectPrincipal(incVecs, col("id"), col("vec"), dir)
        .agg(sum(col("score_fp"))).collect()(0).getLong(0)
    }
    require(s3i == s3f, s"PCA incremental/full projection sums diverged: $s3i vs $s3f")

    // ---- stage 4: ANN — the nightly WRITE (rebuild of the affected
    // cells only, the delta a cell-partitioned store overwrites; the In
    // predicate partition-prunes the existing-affected read) vs full
    // rebuild over base+increment. A pass-through copy of the untouched
    // 1M nodes is deliberately NOT in the incremental number — a
    // cell-addressed store never rewrites them.
    var nAffected = 0
    val (nDelta, wI4, cI4) = time2 {
      val (rebuilt, affected) = Hnsw.rebuiltShards(
        spark.read.parquet(art("idx")).as[Hnsw.NswNode](
          org.apache.spark.sql.Encoders.product[Hnsw.NswNode]),
        cents, incVecs, m = 8, efConstruction = 32)
      nAffected = affected.size
      rebuilt.count()
    }
    val (nFull, wF4, cF4) = time2 {
      Hnsw.buildNswIndex(baseVecs.unionByName(incVecs), cents, m = 8, efConstruction = 32).count()
    }

    def row(tag: String, wi: Double, ci: Double, wf: Double, cf: Double) =
      f""""$tag":{"inc_wall":$wi%.1f,"inc_cpu":$ci%.1f,"full_wall":$wf%.1f,"full_cpu":$cf%.1f,"speedup":${wf / wi}%.1f}"""
    println(s"""{"base":$nBase,"inc":$nInc,${row("dedup", wI1, cI1, wF1, cF1)},${row(
        "neardup", wI2, cI2, wF2, cF2)},${row("pca", wI3, cI3, wF3, cF3)},${row(
        "ann", wI4, cI4, wF4, cF4)},"counts":{"new":$nNew,"distinct":$nDistinct,"flagged":$nFlagged,"pairs":$nPairs,"ann_delta_nodes":$nDelta,"ann_affected_cells":$nAffected,"idx_full":$nFull}}""")
    spark.stop()
  }
}
