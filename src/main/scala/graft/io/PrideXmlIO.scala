package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** PRIDE XML spectra source (SURVEY.md §2.1 S2, the last reference
  * FileType: `FileType.PRIDE`, SubmissionPipelineUtils.java:90,123,142 —
  * read via jmzReader's PRIDEXmlWrapper,
  * JmzReaderSpectrumService.java:43-45; USIs use the `index` scan type
  * with the raw spectrum id, SubmissionPipelineUtils.java:281-289).
  *
  * Public PRIDE XML (mzData core) shape: `<spectrum id="N">` elements with
  * `<spectrumInstrument msLevel=>`, precursor `<ionSelection>` cvParams
  * (m/z MS:1000744 / legacy PSI:1000040, charge MS:1000041 / PSI:1000041,
  * RT seconds PSI:1000039 / MS:1000894), and separate
  * `mzArrayBinary`/`intenArrayBinary` base64 `<data precision= endian=>`
  * arrays (NOT interleaved, unlike mzXML).
  */
object PrideXmlIO {

  final case class PrideSpectrum(
      fileName: String,
      index: Long,
      scanId: String,
      msLevel: Int,
      precursorMz: Double,
      precursorCharge: Int,
      retentionTime: Option[Double],
      masses: Seq[Double],
      intensities: Seq[Double],
  )

  private[io] def decodeArray(
      base64: String, is64bit: Boolean, littleEndian: Boolean): Array[Double] = {
    if (base64 == null || base64.trim.isEmpty) return Array.empty
    val bytes = Base64.getDecoder.decode(base64.replaceAll("\\s", ""))
    val bb = ByteBuffer.wrap(bytes)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val step = if (is64bit) 8 else 4
    val n = bytes.length / step
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (is64bit) bb.getDouble else bb.getFloat.toDouble
      i += 1
    }
    out
  }

  def parseFile(path: String): Seq[PrideSpectrum] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // CDATA-wrapped base64 payloads must surface as CHARACTERS events
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = IoSource.open(path)
    val reader = factory.createXMLStreamReader(in)
    val fileName = IoSource.baseName(path)

    val out = mutable.ArrayBuffer.empty[PrideSpectrum]
    var id: String = null
    var msLevel = 0
    var precMz = 0.0
    var precCharge = 0
    var rt: Option[Double] = None
    var inIonSelection = false
    var inMzArray = false
    var inIntenArray = false
    var inData = false
    var is64 = true
    var little = true
    var masses: Array[Double] = Array.empty
    var intensities: Array[Double] = Array.empty
    val text = new StringBuilder

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
            case "spectrum" =>
              id = attr("id"); msLevel = 0; precMz = 0.0; precCharge = 0; rt = None
              masses = Array.empty; intensities = Array.empty
            case "spectrumInstrument" =>
              msLevel = Option(attr("msLevel")).map(_.toInt).getOrElse(0)
            case "ionSelection" => inIonSelection = true
            case "cvParam" if inIonSelection =>
              val acc = attr("accession"); val v = attr("value")
              if (v != null) acc match {
                case "MS:1000744" | "PSI:1000040" => precMz = v.toDouble
                case "MS:1000041" | "PSI:1000041" => precCharge = v.toDouble.toInt
                case "PSI:1000039" | "MS:1000894" => rt = v.toDoubleOption
                case _ =>
              }
            case "mzArrayBinary" => inMzArray = true
            case "intenArrayBinary" => inIntenArray = true
            case "data" if inMzArray || inIntenArray =>
              inData = true; text.clear()
              is64 = !Option(attr("precision")).contains("32")
              little = !Option(attr("endian")).contains("big")
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inData =>
          text.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "ionSelection" => inIonSelection = false
            case "data" if inData =>
              val arr = decodeArray(text.toString, is64, little)
              if (inMzArray) masses = arr else if (inIntenArray) intensities = arr
              inData = false
            case "mzArrayBinary" => inMzArray = false
            case "intenArrayBinary" => inIntenArray = false
            case "spectrum" =>
              out += PrideSpectrum(fileName, out.size.toLong, id, msLevel,
                precMz, precCharge, rt, masses.toSeq, intensities.toSeq)
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    in.close()
    out.toSeq
  }

  /** One identification row per (PeptideItem, protein accession) from the
    * PRIDE XML identification sections (`<GelFreeIdentification>` /
    * `<TwoDimensionalIdentification>` — the legacy result-file input the
    * reference reaches through PIA/jmzReader,
    * JmzReaderSpectrumService.java:43-45).
    *
    * `psmId` is content-derived (file : spectrum ref : sequence : mods) so
    * the SAME spectrum/peptide/mods claimed by several proteins collapses
    * into ONE PSM set downstream (the pipeline's per-psmId dedup), matching
    * PIA's PSM-set notion — PRIDE XML has no SII id to carry.
    *
    * Charge and experimental m/z live on the SPECTRUM precursor in this
    * format; a PeptideItem-level cvParam (MS:1000041 / MS:1000744, some
    * writers emit them) wins when present, else the fields are null and
    * the command resolves them from the matched spectrum.
    */
  final case class PrideIdentPsm(
      fileName: String,
      psmId: String,
      peptideSequence: String,
      proteinAccession: String,
      database: Option[String],
      isDecoy: Boolean,
      score: Option[Double],
      charge: Option[Int],
      expMassToCharge: Option[Double],
      modifications: Map[Int, String],
      sourceId: String,
      start: Option[Int],
      end: Option[Int],
  )

  /** PSM-score heuristic for the `<additional>` cvParams of a PeptideItem:
    * PRIDE XML predates the standardized PSI-MS score terms, so engines
    * write PRIDE-CV terms like "Mascot score" / "Sequest score" /
    * "X!Tandem expect". Name-based match (contains "score" or "expect",
    * excluding FDR/q-value terms) — the same effective selection PIA's
    * PrideXMLParser performs over its term list, without asserting the
    * whole accession inventory. */
  private[io] def isScoreParam(name: String): Boolean = {
    if (name == null) return false
    val n = name.toLowerCase
    (n.contains("score") || n.contains("expect")) &&
      !n.contains("fdr") && !n.contains("q-value") && !n.contains("threshold")
  }

  private def canonicalPsmId(
      fileName: String, specRef: String, seq: String, mods: Map[Int, String]): String = {
    val base = s"$fileName:$specRef:$seq"
    if (mods.isEmpty) base
    else base + ":" + mods.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
  }

  /** Parse the identification sections of one PRIDE XML file (pure
    * function, runs inside a task). A separate pass from [[parseFile]]:
    * unlike mzIdentML (the primary, potentially multi-GB input, where the
    * one-pass persist in MzIdentMlIO.readParsed pays for itself), legacy
    * PRIDE XML files are small and two independent pure scans keep both
    * readers free of cache contracts. */
  def parseIdentFile(path: String, decoyPrefix: String = "DECOY_"): Seq[PrideIdentPsm] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = IoSource.open(path)
    val reader = factory.createXMLStreamReader(in)
    val fileName = IoSource.baseName(path)

    // per-PeptideItem fields gathered before the owning accession is known
    final case class Pep(
        seq: String, specRef: String, mods: Map[Int, String],
        score: Option[Double], charge: Option[Int], expMz: Option[Double],
        start: Option[Int], end: Option[Int], decoyCv: Boolean)

    val out = mutable.ArrayBuffer.empty[PrideIdentPsm]
    var inIdent = false
    var identAccession: String = null
    var identDatabase: Option[String] = None
    var identScore: Option[Double] = None
    var identDecoyCv = false
    val peps = mutable.ArrayBuffer.empty[Pep]

    var inPep = false
    var pepSeq: String = null
    var pepSpecRef: String = null
    var pepMods = Map.empty[Int, String]
    var pepScore: Option[Double] = None
    var pepCharge: Option[Int] = None
    var pepExpMz: Option[Double] = None
    var pepStart: Option[Int] = None
    var pepEnd: Option[Int] = None
    var pepDecoyCv = false

    var modLoc: Option[Int] = None
    var modAcc: String = null
    var inModItem = false
    var inAdditional = false
    var textTarget: String = null
    val text = new StringBuilder

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
          val name = reader.getLocalName
          name match {
            case "GelFreeIdentification" | "TwoDimensionalIdentification" =>
              inIdent = true; identAccession = null; identDatabase = None
              identScore = None; identDecoyCv = false; peps.clear()
            case "PeptideItem" if inIdent =>
              inPep = true; pepSeq = null; pepSpecRef = null; pepMods = Map.empty
              pepScore = None; pepCharge = None; pepExpMz = None
              pepStart = None; pepEnd = None; pepDecoyCv = false
            case "ModificationItem" if inPep => inModItem = true; modLoc = None; modAcc = null
            case "additional" if inIdent => inAdditional = true
            case "cvParam" if inIdent && inAdditional && !inModItem =>
              val acc = attr("accession"); val nm = attr("name"); val v = attr("value")
              if (inPep) {
                val num = Option(v).flatMap(_.toDoubleOption)
                acc match {
                  case "MS:1000041" | "PSI:1000041" => pepCharge = num.map(_.toInt)
                  case "MS:1000744" | "PSI:1000040" => pepExpMz = num
                  // "Decoy hit" attaches at the PeptideItem level in many
                  // real submissions, not only on the Identification
                  case "PRIDE:0000303" => pepDecoyCv = true
                  case _ =>
                    if (pepScore.isEmpty && isScoreParam(nm)) pepScore = num
                }
              } else if (acc == "PRIDE:0000303") identDecoyCv = true // "Decoy hit"
            case "Sequence" | "SpectrumReference" | "Start" | "End"
                if inPep && !inModItem =>
              textTarget = name; text.clear()
            case "ModLocation" | "ModAccession" if inModItem =>
              textTarget = name; text.clear()
            case "Accession" | "Database" | "Score" if inIdent && !inPep =>
              textTarget = name; text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if textTarget != null =>
          text.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          val name = reader.getLocalName
          name match {
            case "Sequence" | "SpectrumReference" | "Start" | "End" | "ModLocation"
                | "ModAccession" | "Accession" | "Database" | "Score"
                if textTarget == name =>
              val t = text.toString.trim
              name match {
                case "Sequence" => pepSeq = t
                case "SpectrumReference" => pepSpecRef = t
                case "Start" => pepStart = t.toIntOption
                case "End" => pepEnd = t.toIntOption
                case "ModLocation" => modLoc = t.toIntOption
                case "ModAccession" => modAcc = t
                case "Accession" => identAccession = t
                case "Database" => identDatabase = Some(t).filter(_.nonEmpty)
                case "Score" => identScore = t.toDoubleOption
                case _ =>
              }
              textTarget = null
            case "ModificationItem" if inModItem =>
              modLoc.filter(_ => modAcc != null).foreach(l => pepMods += (l -> modAcc))
              inModItem = false
            case "additional" if inAdditional => inAdditional = false
            case "PeptideItem" if inPep =>
              if (pepSeq != null && pepSeq.nonEmpty)
                peps += Pep(pepSeq, Option(pepSpecRef).getOrElse(""), pepMods,
                  pepScore, pepCharge, pepExpMz, pepStart, pepEnd, pepDecoyCv)
              inPep = false
            case "GelFreeIdentification" | "TwoDimensionalIdentification" =>
              val acc = Option(identAccession).getOrElse("")
              val decoy = identDecoyCv || acc.startsWith(decoyPrefix)
              peps.foreach { p =>
                out += PrideIdentPsm(fileName,
                  canonicalPsmId(fileName, p.specRef, p.seq, p.mods),
                  p.seq, acc, identDatabase, decoy || p.decoyCv,
                  // PeptideItem-level score wins; the Identification
                  // <Score> is the protein-level fallback (PIA does the
                  // same when the item carries no engine score term).
                  p.score.orElse(identScore),
                  p.charge, p.expMz, p.mods, p.specRef, p.start, p.end)
              }
              inIdent = false
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    in.close()
    out.toSeq
  }

  /** Distributed identification scan: one task per file. */
  def readIdentifications(
      spark: SparkSession, paths: Seq[String],
      decoyPrefix: String = "DECOY_"): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap(p => parseIdentFile(p, decoyPrefix))
      .toDF()
  }

  /** Distributed scan matching the common spectra row shape (task per
    * file, like the other XML formats — the format is not line-splittable
    * because of the nested binary data elements). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap(parseFile)
      .toDF()
      .withColumn("title", col("scanId"))
      .select("fileName", "index", "scanId", "title", "msLevel", "precursorMz",
        "precursorCharge", "retentionTime", "masses", "intensities")
  }
}
