package graft.io

import graft.model.{ArchiveProteinEvidence, ArchiveSpectrum, SummaryArchiveSpectrum}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines archive-spectrum source/sink (SURVEY.md §2.1 S5, K1, K2).
  *
  * The reference writes one JSON object per line (BackupUtil.java:42-47)
  * and random-accesses them through a byte-offset index
  * (PrideJsonRandomAccess.java:39-53). Spark-first: `write.json` produces
  * exactly the one-object-per-line shape; reads use the FIXED declared
  * schema (never inference — round-trip stability per SURVEY §1.3); the
  * offset index is replaced by predicate pushdown / partition pruning, and
  * point lookups are `filter($"usi" === x)`.
  */
object ArchiveJson {

  /** The declared fixed schemas (SURVEY §1.1/§1.3 — reads never infer). */
  val archiveSpectrumSchema: StructType =
    Encoders.product[ArchiveSpectrum].schema
  val summarySchema: StructType =
    Encoders.product[SummaryArchiveSpectrum].schema
  val proteinEvidenceSchema: StructType =
    Encoders.product[ArchiveProteinEvidence].schema

  /** K1 — plain JSON-lines table write. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K2 — per-source-file partitioned write: the partition key is the third
    * `:`-field of the USI (the raw file name), mirroring the reference's
    * one-writer-per-batch map (PrideAnalysisAssayService.java:768-776).
    * At scale this is exactly `partitionBy`, which also gives partition
    * pruning on read. */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("batch", element_at(split(col("usi"), ":"), 3))
      .write.mode("overwrite").partitionBy("batch").json(path)

  /** S5 — schema-locked JSON-lines read. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(archiveSpectrumSchema).json(path)

  /** S5 (partitioned variant): includes the `batch` partition column. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(archiveSpectrumSchema.add("batch", org.apache.spark.sql.types.StringType))
      .json(path)

  /** spectra-json-check — the validity-rewrite pass (F12): re-parse every
    * spectrum, keep only valid ones
    * (PSMClusteringService.validateJsonFile:91-113, predicate :45-51). */
  def validate(spectra: DataFrame): DataFrame =
    spectra.filter(
      size(col("masses")) > 0 &&
        size(col("masses")) === size(col("intensities")) &&
        col("precursorCharge").isNotNull && col("precursorMz").isNotNull &&
        col("usi").isNotNull && col("peptidoform").isNotNull)

  /** Typed views for API consumers. */
  def readTyped(spark: SparkSession, path: String): Dataset[ArchiveSpectrum] = {
    implicit val enc = Encoders.product[ArchiveSpectrum]
    read(spark, path).as[ArchiveSpectrum]
  }

  def readSummaries(spark: SparkSession, path: String): Dataset[SummaryArchiveSpectrum] = {
    implicit val enc = Encoders.product[SummaryArchiveSpectrum]
    spark.read.schema(summarySchema).json(path).as[SummaryArchiveSpectrum]
  }

  def readProteinEvidence(spark: SparkSession, path: String): Dataset[ArchiveProteinEvidence] = {
    implicit val enc = Encoders.product[ArchiveProteinEvidence]
    spark.read.schema(proteinEvidenceSchema).json(path).as[ArchiveProteinEvidence]
  }
}
