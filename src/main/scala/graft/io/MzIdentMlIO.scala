package graft.io

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** mzIdentML identification source (SURVEY.md §2.1 S1 — the one genuinely
  * custom parser, §7.3). The reference routes mzid through the PIA
  * compiler with a serialize/deserialize hop through /tmp
  * (PIAModelerService.java:162-189); here each file is StAX-parsed inside
  * one Spark task (files on shared storage, one task per file — the
  * per-assay fan-out matches the reference's per-assay Nextflow
  * processes), emitting plain rows.
  *
  * Extracted elements (the subset the dataflow consumes):
  *  - SpectraData: id, location, SpectrumIDFormat cv accession (drives J1
  *    scan-key normalization and J2/J3 file relation);
  *  - Peptide: sequence + positioned Modification accessions (P6/P13);
  *  - PeptideEvidence: isDecoy + DBSequence accession (A14 decoy marking);
  *  - SpectrumIdentificationResult/Item: spectrumID, charge, m/z, rank,
  *    score cvParams.
  */
object MzIdentMlIO {

  final case class SpectraDataRow(
      file: String, spectraDataId: String, location: String, idFormatAccession: String)

  final case class MzidPsm(
      file: String,
      psmId: String,
      peptideSequence: String,
      proteinAccession: String,
      isDecoy: Boolean,
      score: Double,
      rank: Int,
      charge: Int,
      expMassToCharge: Double,
      calcMassToCharge: Double,
      modifications: Map[Int, String],
      sourceId: String,
      spectraDataRef: String,
  )

  final case class Parsed(spectraData: Seq[SpectraDataRow], psms: Seq[MzidPsm])

  /** Common search-engine PSM score CV accessions (public PSI-MS CV):
    * Mascot, SEQUEST, X!Tandem, OMSSA, Comet, MS-GF+, Andromeda, Percolator. */
  val KnownScoreAccessions: Set[String] = Set(
    "MS:1001171", // Mascot:score
    "MS:1001155", // SEQUEST:xcorr
    "MS:1001330", // X!Tandem:expect
    "MS:1001328", // OMSSA:evalue
    "MS:1002257", // Comet:expectation value
    "MS:1002049", // MS-GF:RawScore
    "MS:1002053", // MS-GF:EValue
    "MS:1002338", // Andromeda:score
    "MS:1001492", // percolator:score
    "MS:1001493", // percolator:PEP
  )

  /** q-value / FDR terms never used as the raw engine score. */
  val ExcludedScoreAccessions: Set[String] = Set("MS:1002355", "MS:1002354", "MS:1001491")

  /** Parse one mzIdentML file (pure function, runs inside a task). */
  def parseFile(path: String): Parsed = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // CDATA-wrapped sequence text must surface as CHARACTERS events
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = IoSource.open(path)
    val reader = factory.createXMLStreamReader(in)
    val fileName = IoSource.baseName(path)

    val spectraData = mutable.ArrayBuffer.empty[SpectraDataRow]
    val peptides = mutable.Map.empty[String, (String, Map[Int, String])]
    val evidence = mutable.Map.empty[String, (String, Boolean)] // evId -> (dbSeqRef, isDecoy)
    val dbSeqs = mutable.Map.empty[String, String] // dbSeqId -> accession
    val psms = mutable.ArrayBuffer.empty[MzidPsm]

    var curSpectraDataId: String = null
    var curLocation: String = null
    var curIdFormat: String = null
    var inSpectrumIdFormat = false

    var curPepId: String = null
    var curPepSeq: String = null
    var curMods = Map.empty[Int, String]
    var curModLoc = -1
    var inPeptideSequence = false
    val seqBuf = new StringBuilder

    var sirSpectrumId: String = null
    var sirSpectraDataRef: String = null
    var siiId: String = null
    var siiPepRef: String = null
    val siiEvRefs = mutable.ArrayBuffer.empty[String]
    var siiRank = 0
    var siiCharge = 0
    var siiExpMz = 0.0
    var siiCalcMz = 0.0
    var siiScore = Double.NaN
    var siiScoreKnown = false
    var inSii = false

    def attr(name: String): String = {
      var i = 0
      while (i < reader.getAttributeCount) {
        if (reader.getAttributeLocalName(i) == name) return reader.getAttributeValue(i)
        i += 1
      }
      null
    }

    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "SpectraData" =>
              curSpectraDataId = attr("id"); curLocation = attr("location"); curIdFormat = null
            case "SpectrumIDFormat" => inSpectrumIdFormat = true
            case "cvParam" if inSpectrumIdFormat =>
              curIdFormat = attr("accession")
            case "Peptide" =>
              curPepId = attr("id"); curPepSeq = null; curMods = Map.empty
            case "PeptideSequence" =>
              inPeptideSequence = true; seqBuf.clear()
            case "Modification" =>
              curModLoc = Option(attr("location")).map(_.toInt).getOrElse(-1)
            case "cvParam" if curModLoc >= 0 =>
              val acc = attr("accession")
              if (acc != null && acc.startsWith("UNIMOD")) curMods += (curModLoc -> acc)
            case "PeptideEvidence" =>
              evidence(attr("id")) =
                (attr("dBSequence_ref"), Option(attr("isDecoy")).contains("true"))
            case "DBSequence" =>
              dbSeqs(attr("id")) = Option(attr("accession")).getOrElse(attr("id"))
            case "SpectrumIdentificationResult" =>
              sirSpectrumId = attr("spectrumID"); sirSpectraDataRef = attr("spectraData_ref")
            case "SpectrumIdentificationItem" =>
              inSii = true
              siiId = attr("id")
              siiRank = Option(attr("rank")).map(_.toInt).getOrElse(0)
              siiCharge = Option(attr("chargeState")).map(_.toInt).getOrElse(0)
              siiExpMz = Option(attr("experimentalMassToCharge")).map(_.toDouble).getOrElse(0.0)
              siiCalcMz = Option(attr("calculatedMassToCharge")).map(_.toDouble).getOrElse(0.0)
              siiPepRef = attr("peptide_ref")
              siiEvRefs.clear()
              siiScore = Double.NaN
              siiScoreKnown = false
            case "PeptideEvidenceRef" if inSii =>
              // Keep EVERY evidence ref: shared peptides map one SII to
              // many proteins, and the decoy flag must be the AND over all
              // of them (PIA semantics) — one output row per evidence, the
              // pipeline's min(isDecoy)-per-psmId closes the AND.
              Option(attr("peptideEvidence_ref")).foreach(siiEvRefs += _)
            case "cvParam" if inSii =>
              // Prefer a KNOWN search-engine score accession; fall back to
              // the first numeric cvParam that is not a q-value/FDR term
              // (an SII can list counts like "number of unmatched peaks"
              // before its score).
              val acc = attr("accession")
              val v = attr("value")
              if (v != null) {
                val numeric = try { Some(v.toDouble) } catch { case _: NumberFormatException => None }
                numeric.foreach { d =>
                  if (KnownScoreAccessions.contains(acc)) { siiScore = d; siiScoreKnown = true }
                  else if (!siiScoreKnown && siiScore.isNaN && !ExcludedScoreAccessions.contains(acc))
                    siiScore = d
                }
              }
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inPeptideSequence =>
          seqBuf.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "SpectraData" =>
              spectraData += SpectraDataRow(fileName, curSpectraDataId, curLocation,
                Option(curIdFormat).getOrElse(""))
            case "SpectrumIDFormat" => inSpectrumIdFormat = false
            case "PeptideSequence" =>
              inPeptideSequence = false; curPepSeq = seqBuf.toString.trim
            case "Modification" => curModLoc = -1
            case "Peptide" => peptides(curPepId) = (curPepSeq, curMods)
            case "SpectrumIdentificationItem" =>
              val (seq, mods) = peptides.getOrElse(siiPepRef, (null, Map.empty[Int, String]))
              val evRefs = if (siiEvRefs.isEmpty) Seq(null: String) else siiEvRefs.toSeq
              evRefs.foreach { evRef =>
                val (dbRef, isDecoy) = evidence.getOrElse(evRef, (null, false))
                val accession = dbSeqs.getOrElse(dbRef, Option(dbRef).getOrElse(""))
                psms += MzidPsm(fileName, siiId, seq, accession, isDecoy,
                  if (siiScore.isNaN) 0.0 else siiScore, siiRank, siiCharge,
                  siiExpMz, siiCalcMz, mods, sirSpectrumId, sirSpectraDataRef)
              }
              inSii = false
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    in.close()
    Parsed(spectraData.toSeq, psms.toSeq)
  }

  /** Distributed scan: one task per file. */
  def readPsms(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap(p => parseFile(p).psms)
      .toDF()
  }

  /** ONE StAX pass per file serving BOTH outputs: callers needing psms AND
    * spectraData (generate-index-files) would otherwise parse every large
    * XML file twice. The parsed RDD is pinned until the returned release
    * handle is called. */
  def readParsed(
      spark: SparkSession, paths: Seq[String]): (DataFrame, DataFrame, () => Unit) = {
    import spark.implicits._
    val parsed = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .map(parseFile)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (parsed.flatMap(_.psms).toDF(), parsed.flatMap(_.spectraData).toDF(),
      () => { parsed.unpersist(); () })
  }

  def readSpectraData(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap(p => parseFile(p).spectraData)
      .toDF()
  }
}
