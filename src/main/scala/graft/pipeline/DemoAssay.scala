package graft.pipeline

import java.nio.file.Files

import graft.functions.UsiFunctions
import graft.io.{MgfIO, MzTabIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic in-memory micro-assay (FIXTURES.md §6 shape) used by the
  * driver-visible pipeline demo queries and by the docs. Every F/J/A/P
  * operator edge case from SURVEY §2 is hit by at least one row. */
object DemoAssay {

  def psms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("1", "PEPTIDEK", "sp|P1", false, 10.0, 2, 458.23, 458.23, Map(3 -> "UNIMOD:35"), "index=0"),
      ("2", "ELVISLIVESK", "sp|P1", false, 9.5, 2, 607.38, 607.38, Map.empty[Int, String], "index=1"),
      ("2", "ELVISLIVESK", "sp|P2", false, 9.5, 2, 607.38, 607.38, Map.empty[Int, String], "index=1"),
      ("4", "AAAAKPEPR", "sp|P2", false, 9.0, 2, 456.76, 456.76, Map.empty[Int, String], "index=2"),
      ("5", "DECOYPEPK", "DECOY_P9", true, 2.0, 2, 524.76, 524.76, Map.empty[Int, String], "index=3"),
      ("6", "SHORT", "sp|P3", false, 8.0, 2, 295.17, 295.17, Map.empty[Int, String], "index=4"),
      ("7", "APEPTIDE", "sp|P3", false, 7.0, 2, 434.71, 434.71, Map(1 -> "UNIMOD:21"), "index=5"),
      ("8", "MISSINGSPEC", "sp|P3", false, 6.0, 2, 600.0, 600.0, Map.empty[Int, String], "index=null"),
    ).toDF("psmId", "peptideSequence", "proteinAccession", "isDecoy", "score",
        "charge", "expMassToCharge", "calcMassToCharge", "modifications", "sourceId")
      .withColumn("fileName", lit("run1.mgf"))
      .withColumn("idFormat", lit(UsiFunctions.IdFormat.MultiPeakListNativeId))
      .withColumn("fileType", lit("MGF"))
      .withColumn("retentionTime", lit(null).cast("double"))
  }

  def spectra(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 to 5).map { i =>
      ("run1.mgf", i.toLong, i.toString, s"spec$i", 2, 400.0 + i, 2,
        Some(60.0 + i), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0))
    }.toDF("fileName", "index", "scanId", "title", "msLevel", "precursorMz",
        "precursorCharge", "retentionTime", "masses", "intensities")
      .withColumn("fileType", lit("MGF"))
  }

  val config: IndexPipeline.IndexConfig = IndexPipeline.IndexConfig(
    projectAccession = "PXDTEST", assayAccession = "assay1",
    qValueThreshold = 0.05, minPsms = 1)

  /** Session-scoped memo for the demo index run: four driver queries
    * (pipeline_index_spectra / pipeline_index_proteins / pipeline_validity
    * / io_archive_json_roundtrip) plus the MGF roundtrip all read this same
    * 8-row DAG; without the memo each re-derives the full
    * FDR/join/projection pipeline. Entries hold persisted frames — entry
    * points call [[releaseIndex]] on exit (the demo's only long-lived
    * state). */
  private val indexMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), IndexPipeline.IndexOutputs]()

  def runIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "default"),
      { case (s, _) => IndexPipeline.run(psms(s), spectra(s), None, config) })

  /** Pre-materialize every session memo the driver queries share (the five
    * demo index DAGs), so per-query bench numbers price per-query plans
    * instead of whichever query runs first alphabetically paying the
    * one-time cache build. Returns seconds spent; callers report it as a
    * separate warmup figure. Evaluating one output per DAG suffices: the
    * persisted frames (psmsU, perPsm) sit below every output. */
  def warmup(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // The six DAGs are independent and fixture-sized: wall time is driver
    // planning + stage-scheduling latency, not data. Build and materialize
    // them from parallel threads — Spark job submission is thread-safe, and
    // the scheduler interleaves the six jobs' tiny stages. Sequential this
    // was ~55 s of dead wall time before the first measured query.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val builds = Seq[SparkSession => IndexPipeline.IndexOutputs](
      runIndex, filterGateIndex, combinedFdrProteinIndex,
      pickedFdrIndex, multiFileIndex, prideXmlIndex,
    ).map(b => Future {
      b(spark).archiveSpectra.write.format("noop").mode("overwrite").save()
    })
    try Await.result(Future.sequence(builds), Duration.Inf)
    finally pool.shutdown()
    (System.nanoTime() - t0) / 1e9
  }

  /** Drop and unpersist this session's memoized index runs (idempotent). */
  def releaseIndex(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    indexMemo.keySet.asScala.filter(_._1 eq spark).toSeq.foreach { k =>
      val v = indexMemo.remove(k)
      if (v != null) v.unpersist()
    }
  }

  /** F8/F11 differentiating variant (round-3 gap; F8 semantics re-pinned
    * in round 5 to PIA parity): the demo assay plus
    *  - sp|P4 with ONE peptide unique to it (kept at `uniquePeptides` = 1
    *    under the PIA predicate; the old distinct-count ≥ 2 gate dropped it);
    *  - sp|P5/sp|P6 sharing BOTH their peptides (2 distinct, 0 unique —
    *    dropped ONLY by the PIA unique-to-protein predicate; the old
    *    distinct-count gate kept them);
    *  - PSM 9 aimed at an injected msLevel-1 spectrum (swallowed only by
    *    the F11 gate).
    * Flipping either filter off — or restoring the distinct-count F8 —
    * changes the row set. */
  def filterGateIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "filterGates"),
      { case (s, _) => buildFilterGateIndex(s) })

  private def buildFilterGateIndex(spark: SparkSession): IndexPipeline.IndexOutputs = {
    import spark.implicits._
    val extraPsms = Seq(
      ("9", "MSLEVELONEK", "sp|P1", false, 5.5, 2, 630.84, 630.84,
        Map.empty[Int, String], "index=6"),
      ("10", "ONLYONEPEPK", "sp|P4", false, 5.0, 2, 635.35, 635.35,
        Map.empty[Int, String], "index=7"),
      // sp|P5/sp|P6: every peptide shared between exactly the two of them
      // -> 2 distinct peptides each, 0 UNIQUE peptides each.
      ("11", "SHAREDPEPAK", "sp|P5", false, 4.8, 2, 578.32, 578.32,
        Map.empty[Int, String], "index=8"),
      ("11", "SHAREDPEPAK", "sp|P6", false, 4.8, 2, 578.32, 578.32,
        Map.empty[Int, String], "index=8"),
      ("12", "SHAREDPEPBK", "sp|P5", false, 4.6, 2, 592.33, 592.33,
        Map.empty[Int, String], "index=9"),
      ("12", "SHAREDPEPBK", "sp|P6", false, 4.6, 2, 592.33, 592.33,
        Map.empty[Int, String], "index=9"),
    ).toDF("psmId", "peptideSequence", "proteinAccession", "isDecoy", "score",
        "charge", "expMassToCharge", "calcMassToCharge", "modifications", "sourceId")
      .withColumn("fileName", lit("run1.mgf"))
      .withColumn("idFormat", lit(UsiFunctions.IdFormat.MultiPeakListNativeId))
      .withColumn("fileType", lit("MGF"))
      .withColumn("retentionTime", lit(null).cast("double"))
    val extraSpectra = Seq(
      ("run1.mgf", 6L, "6", "spec6", 1, 406.0, 2, // msLevel 1 -> F11 drop
        Some(66.0), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0)),
      ("run1.mgf", 7L, "7", "spec7", 2, 407.0, 2,
        Some(67.0), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0)),
      ("run1.mgf", 8L, "8", "spec8", 2, 408.0, 2,
        Some(68.0), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0)),
      ("run1.mgf", 9L, "9", "spec9", 2, 409.0, 2,
        Some(69.0), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0)),
    ).toDF("fileName", "index", "scanId", "title", "msLevel", "precursorMz",
        "precursorCharge", "retentionTime", "masses", "intensities")
      .withColumn("fileType", lit("MGF"))
    IndexPipeline.run(
      psms(spark).unionByName(extraPsms),
      spectra(spark).unionByName(extraSpectra),
      None, config.copy(uniquePeptides = 1))
  }

  /** PIA protein-FDR parity variant: the same demo rows with proteins
    * scored and calibrated off the PSM-level FDR score
    * (`proteinScoreFromPsmFdrScore`, PIAModelerService.java:80-101)
    * instead of best PSM q. Differentiates from [[runIndex]]'s protein
    * output: the demo PSM FDR scores (rank-interpolated) differ per PSM
    * while all accepted q-values tie, so the multiplicative score — and
    * the reported score properties — change per protein. */
  def combinedFdrProteinIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "combinedFdrProteins"),
      { case (s, _) => IndexPipeline.run(psms(s), spectra(s), None,
          config.copy(proteinScoreFromPsmFdrScore = true)) })

  /** Picked-protein-FDR differentiating variant: the demo assay plus a
    * decoy PSM for DECOY_sp|P1 — the paired-decoy partner of sp|P1 —
    * under loose q thresholds so it survives to the protein stage. With
    * `pickedProteinFdr = true` the pair competition drops the
    * worse-scoring DECOY_sp|P1 before calibration; flipping the flag off
    * leaves it in the evidence and changes the row set. */
  def pickedFdrIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "pickedFdr"),
      { case (s, _) => buildPickedFdrIndex(s) })

  private def buildPickedFdrIndex(spark: SparkSession): IndexPipeline.IndexOutputs = {
    import spark.implicits._
    val extraPsms = Seq(
      ("11", "ELVISLIVESR", "DECOY_sp|P1", true, 3.0, 2, 640.0, 640.0,
        Map.empty[Int, String], "index=6"),
    ).toDF("psmId", "peptideSequence", "proteinAccession", "isDecoy", "score",
        "charge", "expMassToCharge", "calcMassToCharge", "modifications", "sourceId")
      .withColumn("fileName", lit("run1.mgf"))
      .withColumn("idFormat", lit(UsiFunctions.IdFormat.MultiPeakListNativeId))
      .withColumn("fileType", lit("MGF"))
      .withColumn("retentionTime", lit(null).cast("double"))
    val extraSpectra = Seq(
      ("run1.mgf", 6L, "6", "spec6", 2, 406.0, 2,
        Some(66.0), Seq(100.0, 200.0, 300.0), Seq(10.0, 20.0, 30.0)),
    ).toDF("fileName", "index", "scanId", "title", "msLevel", "precursorMz",
        "precursorCharge", "retentionTime", "masses", "intensities")
      .withColumn("fileType", lit("MGF"))
    IndexPipeline.run(
      psms(spark).unionByName(extraPsms),
      spectra(spark).unionByName(extraSpectra),
      None, config.copy(qValueThreshold = 1.0, proteinQThreshold = 1.0,
        pickedProteinFdr = true))
  }

  /** Multi-result-file e2e (the reference's combined-inference variant,
    * PIAModelerService.java:191-219 + :107-114): two mzids over one MGF,
    * run through the FULL generateIndexFilesFromMzid command (parse,
    * SpectraData join, rank gate, PSM-set collapse, index DAG, JSON
    * writes). Comet expectation scores: lower is better. */
  def multiFileIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "multiFile"),
      { case (s, _) =>
        val (mzids, spectraDir) = DemoFixtures.multiFileFixture()
        val out = Files.createTempDirectory("graft-demo-multifile-out").toString
        Commands.generateIndexFilesFromMzid(
          s, mzids, spectraDir, out,
          IndexPipeline.IndexConfig(
            projectAccession = "PXDMULTI", assayAccession = "assayM",
            qValueThreshold = 0.5, proteinQThreshold = 1.0, minPsms = 1,
            scoreLowerIsBetter = true))
      })

  /** PRIDE XML e2e (the self-contained legacy identification input): the
    * full generate-index-files DAG over the DemoFixtures.prideXmlIdent
    * file — identification sections + mzData spectra from ONE file,
    * spectrum-precursor charge resolution, PSM-set collapse of the shared
    * peptide, PRIDE:0000303 decoy, index-type USIs. */
  def prideXmlIndex(spark: SparkSession): IndexPipeline.IndexOutputs =
    indexMemo.computeIfAbsent((spark, "prideXml"),
      { case (s, _) =>
        val xml = DemoFixtures.prideXmlIdentFile()
        val out = Files.createTempDirectory("graft-demo-pridexml-out").toString
        Commands.generateIndexFilesFromPrideXml(
          s, Seq(xml), out,
          IndexPipeline.IndexConfig(
            projectAccession = "PXDPRIDE", assayAccession = "assayP",
            qValueThreshold = 1.0, proteinQThreshold = 1.0, minPsms = 1))
      })

  def clusterSpectra(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "u0", "AAK", "AAK/2", false, 0.010),
      (1L, "u1", "AAK", "AAK/2", false, 0.005),
      (2L, "u2", "LEVK", "LEVK/2", false, 0.010),
      (3L, "u3", "IEVK", "IEVK/2", false, 0.020),
      (4L, "u4", "CCK", "CCK/2", false, 0.010),
      (5L, "u5", "DDK", "DDK/2", false, 0.010),
      (6L, "u6", "EEK", "EEK/2", false, 0.030),
    ).toDF("index", "usi", "peptideSequence", "peptidoform", "isDecoy", "score")
  }

  def clusters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("f", 0L, 10L), ("f", 1L, 10L), ("f", 2L, 11L), ("f", 3L, 11L),
      ("f", 4L, 12L), ("f", 5L, 12L), ("f", 6L, 13L),
    ).toDF("file", "spectrumIndex", "clusterId")
  }

  /** K3 + S2 — write the demo archive spectra as MGF, read them back. */
  def mgfRoundTrip(spark: SparkSession): DataFrame = {
    val out = runIndex(spark).archiveSpectra
      .select(col("usi"), col("peptidoform"), col("precursorMz"),
        col("precursorCharge"), col("masses"), col("intensities"))
    val dir = Files.createTempDirectory("graft-demo-mgf").toString + "/spectra"
    MgfIO.write(out, Seq(col("usi")), dir)
    MgfIO.read(spark, dir)
  }

  val mzTabContent: String =
    """MTD	mzTab-version	1.0.0
      |MTD	ms_run[1]-location	file://data/run1.mgf
      |PSH	sequence	PSM_ID	accession	unique	search_engine_score[1]	modifications	charge	exp_mass_to_charge	calc_mass_to_charge	spectra_ref	opt_global_cv_MS:1002217_decoy_peptide
      |PSM	PEPTIDEK	1	sp|P1	1	0.9	3-UNIMOD:35	2	445.1	445.0	ms_run[1]:index=0	0
      |PSM	ELVISLIVESK	2	DECOY_sp|P2	1	0.8	null	3	500.0	500.2	ms_run[1]:index=1	1
      |""".stripMargin

  /** S1 — mzTab scan through a temp file. */
  def mzTabDemo(spark: SparkSession): DataFrame = {
    val dir = Files.createTempDirectory("graft-demo-mztab")
    val f = dir.resolve("demo.mztab")
    Files.writeString(f, mzTabContent)
    MzTabIO.standardPsms(MzTabIO.readPsmSection(spark, f.toString))
  }
}
