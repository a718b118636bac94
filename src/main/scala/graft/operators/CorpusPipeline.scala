package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite training-corpus construction pipeline — the end-to-end shape
  * a 100 TB data-curation job takes:
  *
  *   quality filter -> language filter -> exact dedup -> MinHash-LSH
  *   near-dup detection -> connected-component representative selection
  *
  * Every stage is one of the engine's verified operators; the composition
  * is a single declarative plan except the CC loop (bounded iterative
  * joins). */
object CorpusPipeline {

  final case class CorpusConfig(
      minQuality: Double = 0.5,
      keepLangs: Seq[String] = Seq.empty, // empty = all
      shingleN: Int = 3,
      minHashes: Int = 16,
      lshBands: Int = 4,
      nearDupThreshold: Double = 0.7,
  ) {
    // validated at the config boundary so a bad combination names THESE
    // fields, not the derived rowsPerBand deep inside minHashLshPairs
    require(lshBands >= 1, s"CorpusConfig: lshBands must be >= 1, got $lshBands")
    require(minHashes >= 1 && minHashes % lshBands == 0,
      s"CorpusConfig: minHashes ($minHashes) must be a positive multiple of lshBands ($lshBands)")
  }

  /** Corpus result with a cache-release handle: `buildCorpus` persists an
    * intermediate frame that the returned plan reads several times; callers
    * in a long-lived session call `unpersist()` once the result has been
    * materialized (same contract as `IndexPipeline.IndexOutputs`). */
  final case class CorpusResult(corpus: DataFrame, unpersist: () => Unit)

  /** @param docs (id, text) document table
    * @return surviving documents (id, text, predicted_lang, quality_score)
    *         plus the cache-release handle
    */
  def buildCorpus(docs: DataFrame, cfg: CorpusConfig = CorpusConfig()): CorpusResult = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val q = TextFunctions.qualityMetrics(col("text"))
    val scored = docs
      .withColumn("quality_score", q.getField("quality_score"))
      .withColumn("predicted_lang", TextFunctions.langIdHeuristic(col("text")))
      .filter(col("quality_score") >= cfg.minQuality)
    val langFiltered =
      if (cfg.keepLangs.isEmpty) scored
      else scored.filter(col("predicted_lang").isin(cfg.keepLangs: _*))

    // exact dedup first (cheap hash groupBy removes identical payloads).
    // Cached: the shingle explosion, the survivor anti-join, and the final
    // semi-join all re-read this frame, and its quality/langid regex
    // columns are the expensive part of the scan.
    // r15: internal fingerprint (dropped below) keyed on xxhash64 instead
    // of md5 — same text-equality classes on collision-free corpora (the
    // span-family parity argument); the null guard keeps md5's
    // null-in/null-out contract so Dedup.exact's per-row null grouping is
    // unchanged.
    val exact = Dedup.exact(langFiltered, col("id"),
      when(col("text").isNotNull, xxhash64(col("text"))))
      .drop("fingerprint", "dup_count")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup pairs via MinHash LSH, resolved to one survivor per component
    val shingles = exact.select(col("id"),
      explode(TextFunctions.wordShingles(col("text"), cfg.shingleN)).as("shingle"))
    val sigs = Dedup.minHashSignature(shingles, col("id"), col("shingle"), cfg.minHashes)
    val pairs = Dedup.minHashLshPairs(sigs, cfg.lshBands,
      cfg.minHashes / cfg.lshBands, cfg.nearDupThreshold)
    val survivors = Dedup.dedupByPairs(exact.select(col("id")), pairs)

    val corpus = exact.join(survivors, Seq("id"), "left_semi")
      .select(col("id"), col("text"), col("predicted_lang"), col("quality_score"))
    CorpusResult(corpus, () => { exact.unpersist(); () })
  }
}
