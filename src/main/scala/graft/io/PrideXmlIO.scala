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
