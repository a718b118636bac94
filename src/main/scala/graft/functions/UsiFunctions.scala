package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** USI / identifier column functions (SURVEY.md §2.2 P3-P5, P7-P8; §2.3 J1).
  *
  * All are pure `Column` expressions (whole-stage-codegen friendly) — no UDFs.
  * Semantics derived from the reference implementation, cited per function.
  */
object UsiFunctions {

  /** The 22 special characters stripped from USIs.
    * Reference: SubmissionPipelineUtils.java:43-67 (chain of `replace` calls:
    * `( ) _ space = & $ @ ; + ? { ^ } % ] > [ ~ < # |`). */
  val UsiSpecialChars = "[()_ =&$@;+?{^}%\\]>\\[~<#|]"

  /** P4 — strip special characters from a USI. */
  def cleanUsi(usi: Column): Column = regexp_replace(usi, UsiSpecialChars, "")

  /** P3 — build a USI: `mzspec:{project}:{fileNoExt}:{scanType}:{id}`.
    * Reference: SubmissionPipelineUtils.buildUsi:289-305, Constants.java:30-32. */
  def buildUsi(project: Column, fileNameNoExt: Column, scanType: Column, id: Column): Column =
    concat_ws(":", lit("mzspec"), project, fileNameNoExt, scanType, id)

  /** P3 (WIFF branch) — a native id like
    * `sample=1 period=1 cycle=1 experiment=1` becomes `1,1,1,1`: the `k=v`
    * values joined with ",". Reference: SubmissionPipelineUtils.java:293-301. */
  def nativeIdValues(id: Column): Column =
    array_join(transform(split(id, " "), t => element_at(split(t, "="), 2)), ",")

  /** P5 — spectrum-dedup key: first 5 `:`-fields of the USI.
    * Reference: SubmissionPipelineUtils.getSpectraUsiFromUsi:258-265. */
  def spectraUsi(usi: Column): Column =
    concat_ws(":", slice(split(usi, ":"), 1, 5))

  /** P8 — base file name without compression (.gz/.zip) and real
    * extension, after stripping shell quotes/backslashes (the reference's
    * cleanFileName, ArchiveMoleculesIndexer.java:299-307, handles quoted
    * CLI arguments). Reference:
    * SubmissionPipelineUtils.getFileNameNoExtension:275-278 with
    * returnUnCompressPath:174-179 and FilenameUtils.getName. */
  def fileNameNoExtension(path: Column): Column = {
    val unquoted = regexp_replace(path, "[\"'\\\\]", "")
    val base = element_at(split(unquoted, "/"), -1)
    val uncompressed = regexp_replace(base, "\\.(gz|zip)$", "")
    regexp_replace(uncompressed, "\\.[^.]*$", "")
  }

  /** F2 — true when the file name carries a compression extension.
    * Reference: SubmissionPipelineUtils.isCompressedByExtension:39-41. */
  def isCompressed(fileName: Column): Column =
    fileName.endsWith("gz") || fileName.endsWith("zip")

  /** P7 — isobaric normalization: leucine -> isoleucine, for cluster
    * comparison. Reference: StringUtils.makePeptideIsobaric:38-40. */
  def isobaric(sequence: Column): Column = translate(sequence, "L", "I")

  /** WIFF-style native-id predicate.
    * Reference: SubmissionPipelineUtils.isValidWiffId:254-256. */
  def isWiffId(id: Column): Column =
    id.contains("sample") && id.contains("period") &&
      id.contains("cycle") && id.contains("experiment")

  /** Spectrum-id formats that matter for scan-key normalization (J1).
    * Mirrors SpecIdFormat (SubmissionPipelineUtils.java:72-83, mapping from CV
    * accessions :349-360). */
  object IdFormat {
    val MascotQueryNum = "MASCOT_QUERY_NUM"
    val MultiPeakListNativeId = "MULTI_PEAK_LIST_NATIVE_ID"
    val SpectrumNativeId = "SPECTRUM_NATIVE_ID"
    val MzmlId = "MZML_ID"
    val None = "NONE"

    /** CV accession -> id format (SubmissionPipelineUtils.java:349-360). */
    def fromAccession(acc: Column): Column =
      when(acc === "MS:1001528", MascotQueryNum)
        .when(acc === "MS:1000774", MultiPeakListNativeId)
        .when(acc === "MS:1001530", MzmlId)
        .when(acc === "MS:1000768", SpectrumNativeId)
        .otherwise(None)
  }

  /** J1 — normalize a PSM's raw spectrum reference into the join key used to
    * match the spectrum row, per id format:
    *
    *  - Mascot query / MGF index formats: strip `query=`/`index=`; integral
    *    values are 1-based-corrected (`+1`), non-integral become null.
    *  - WIFF native ids pass through unchanged.
    *  - mzML/native formats: the first space-separated token containing
    *    `scan=` with the `scan=` prefixes removed, else the raw id.
    *  - anything else passes through.
    *
    * Reference: SubmissionPipelineUtils.getSpectrumId:216-252. */
  def normalizeScanId(sourceId: Column, idFormat: Column): Column = {
    val stripped = regexp_replace(sourceId, "query=|index=", "")
    val isInt = stripped.rlike("^[+-]?\\d+$")
    val mascot = when(isInt, (stripped.cast("long") + 1).cast("string"))
    val scanToks = filter(split(sourceId, " "), t => t.contains("scan="))
    val scanTok = when(size(scanToks) > 0, regexp_replace(element_at(scanToks, 1), "scan=", ""))
      .otherwise(sourceId)
    when(idFormat === IdFormat.MascotQueryNum || idFormat === IdFormat.MultiPeakListNativeId, mascot)
      .when((idFormat === IdFormat.SpectrumNativeId) && isWiffId(sourceId), sourceId)
      .when(idFormat === IdFormat.SpectrumNativeId || idFormat === IdFormat.MzmlId, scanTok)
      .otherwise(sourceId)
  }
}
