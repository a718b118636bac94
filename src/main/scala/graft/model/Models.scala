package graft.model

/** Data model for the Spark-native molecule-index engine.
  *
  * Re-expresses the reference's Java value classes (see SURVEY.md §1) as Scala
  * case classes with stable Spark `Encoder`s. Field names deliberately match
  * the Jackson JSON field names of the reference's `data-provider-api` classes
  * so `df.write.json` produces the same shape as the reference's JSON-lines
  * output (reference builders: PrideAnalysisAssayService.java:710-758,
  * :968-983).
  */

/** (cvLabel, accession, name, value) controlled-vocabulary tuple.
  * Reference usage: PrideAnalysisAssayService.java:594-610. */
final case class CvParam(
    cvLabel: String,
    accession: String,
    name: String,
    value: String,
)

/** Accession/name/value triple (no CV label). */
final case class Param(accession: String, name: String, value: String)

/** One (position -> site probabilities) entry of a modification position map.
  * Reference: PrideAnalysisAssayService.java:663-696. */
final case class PositionProbability(position: Int, probabilities: Seq[CvParam])

/** Peptide modification: CV term + positions (+ optional neutral loss).
  * Reference: PrideAnalysisAssayService.java:1007-1047. */
final case class IdentifiedModification(
    neutralLoss: Option[CvParam],
    positionMap: Seq[PositionProbability],
    modification: CvParam,
    properties: Seq[CvParam],
)

/** (charge, mz, usi, sequence, peptidoform) nested in protein evidence.
  * Reference: PrideAnalysisAssayService.java:782, :982. */
final case class PeptideSpectrumOverview(
    charge: Int,
    precursorMass: Double,
    usi: String,
    peptideSequence: String,
    peptidoform: String,
)

/** Full archive spectrum: PSM + peak arrays, keyed by USI.
  * Reference builder: PrideAnalysisAssayService.java:710-738. */
final case class ArchiveSpectrum(
    usi: String,
    spectraUsi: String,
    projectAccession: String,
    assayAccession: String,
    reanalysisAccession: Option[String],
    peptideSequence: String,
    peptidoform: String,
    isDecoy: Boolean,
    isValid: Boolean,
    retentionTime: Option[Double],
    msLevel: Int,
    precursorCharge: Int,
    precursorMz: Double,
    masses: Seq[Double],
    intensities: Seq[Double],
    numPeaks: Int,
    missedCleavages: Int,
    proteinAccessions: Seq[String],
    modifications: Seq[IdentifiedModification],
    bestSearchEngineScore: Param,
    scores: Seq[Param],
    properties: Seq[Param],
    sampleProperties: Seq[Param],
    qualityEstimationMethods: Seq[Param],
)

/** PSM summary for the search index (projection of [[ArchiveSpectrum]]
  * without peaks/modifications; precursorMz comes from the PSM).
  * Reference builder: PrideAnalysisAssayService.java:740-758. */
final case class SummaryArchiveSpectrum(
    usi: String,
    spectraUsi: String,
    projectAccession: String,
    assayAccession: String,
    reanalysisAccession: Option[String],
    peptideSequence: String,
    peptidoform: String,
    isDecoy: Boolean,
    isValid: Boolean,
    precursorCharge: Int,
    precursorMz: Double,
    numPeaks: Int,
    proteinAccessions: Seq[String],
    bestSearchEngineScore: Param,
    scores: Seq[Param],
    sampleProperties: Seq[Param],
)

/** Per-protein rollup keyed by reported accession.
  * Reference builder: PrideAnalysisAssayService.java:968-983. */
final case class ArchiveProteinEvidence(
    reportedAccession: String,
    projectAccession: String,
    assayAccession: String,
    reanalysisAccession: Option[String],
    isValid: Boolean,
    isDecoy: Boolean,
    numberPeptides: Int,
    numberPSMs: Int,
    modificationsNames: Seq[String],
    bestSearchEngineScore: Param,
    properties: Seq[Param],
    qualityEstimationMethods: Seq[Param],
    psmAccessions: Seq[PeptideSpectrumOverview],
)

/** A parsed PSM row from an identification file (mzTab / mzIdentML), before
  * FDR and spectrum joining. `sourceId` is the raw spectrum reference (e.g.
  * `index=12`, `controllerType=0 controllerNumber=1 scan=7`). */
final case class Psm(
    psmId: String,
    peptideSequence: String,
    proteinAccession: String,
    isDecoy: Boolean,
    score: Double,
    charge: Int,
    expMassToCharge: Double,
    calcMassToCharge: Double,
    modifications: Map[Int, String],
    sourceId: String,
    fileName: String,
    retentionTime: Option[Double],
)

/** One spectrum scanned from an MGF/mzML file (SURVEY.md §2.1 S2). */
final case class Spectrum(
    fileName: String,
    index: Long,
    scanId: String,
    title: String,
    msLevel: Int,
    precursorMz: Double,
    precursorCharge: Int,
    retentionTime: Option[Double],
    masses: Seq[Double],
    intensities: Seq[Double],
)
