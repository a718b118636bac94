package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Param/score-array hygiene and misc glue functions
  * (SURVEY.md §2.2 F13, F14; §2.1 S8). */
object ParamFunctions {

  /** F13 — a spectrum scan id must parse as an integer unless it is a
    * WIFF-style native id.
    * Reference: PrideAnalysisAssayService.java:556-562,
    * SubmissionPipelineUtils.isValidWiffId:254-256. */
  def isValidScanId(scanId: Column): Column =
    scanId.rlike("^[+-]?\\d+$") || UsiFunctions.isWiffId(scanId)

  /** Accessions excluded from PSM score lists (the q-value/FDRScore params
    * are carried separately): PrideAnalysisAssayService.java:594-605. */
  val ExcludedScoreAccessions: Seq[String] = Seq("MS:1002355", "MS:1002354")

  /** Accessions excluded from spectrum property lists:
    * PrideAnalysisAssayService.java:613-625. */
  val ExcludedPropertyAccessions: Seq[String] = Seq("MS:1002362", "MS:1000894", "PRIDE:0000511")

  /** F14 — keep score params that are non-null, non-NaN, non-zero, and not
    * in the exclusion list. Operates on `array<struct<accession,name,value>>`. */
  private val NumericRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  def filterScores(params: Column): Column = {
    val excluded = array(ExcludedScoreAccessions.map(lit): _*)
    filter(params, p =>
      p.getField("value").isNotNull &&
        p.getField("value") =!= "NaN" &&
        // rlike-guarded before the cast: ANSI mode throws on malformed casts
        p.getField("value").rlike(NumericRe) &&
        p.getField("value").cast("double") =!= 0.0 &&
        !array_contains(excluded, p.getField("accession")))
  }

  /** F14 (property variant) — drop excluded property accessions. */
  def filterProperties(params: Column): Column = {
    val excluded = array(ExcludedPropertyAccessions.map(lit): _*)
    filter(params, p => !array_contains(excluded, p.getField("accession")))
  }

  /** S8 — pipeline-glue URL rewrite: `ftp://` becomes `https://`
    * (submissions.nf:94-98). */
  def ftpToHttps(url: Column): Column =
    regexp_replace(url, "^ftp://", "https://")
}
