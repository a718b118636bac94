package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64
import java.util.zip.Inflater

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** mzML spectra source (SURVEY.md §2.1 S2, mzML branch).
  *
  * The reference random-accesses mzML through jmzReader by native id
  * (JmzReaderSpectrumService.java:69-111); here each file is StAX-parsed
  * in one Spark task into spectrum rows, and point lookups become joins.
  * Peak arrays follow the public PSI mzML spec: base64-encoded binary,
  * little-endian, 64-bit (MS:1000523) or 32-bit (MS:1000521) floats,
  * optionally zlib-compressed (MS:1000574); m/z MS:1000514, intensity
  * MS:1000515; msLevel MS:1000511, precursor m/z MS:1000744, charge
  * MS:1000041, scan start time MS:1000016.
  */
object MzMlIO {

  final case class MzMlSpectrum(
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

  private[io] def decodePeaks(
      base64: String, is64bit: Boolean, zlib: Boolean): Array[Double] = {
    if (base64 == null || base64.isEmpty) return Array.empty
    var bytes = Base64.getDecoder.decode(base64.replaceAll("\\s", ""))
    if (zlib) {
      val inflater = new Inflater()
      inflater.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      while (!inflater.finished()) {
        val n = inflater.inflate(buf)
        if (n == 0 && inflater.needsInput()) throw new IllegalArgumentException("truncated zlib")
        out.write(buf, 0, n)
      }
      inflater.end()
      bytes = out.toByteArray
    }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (is64bit) {
      val n = bytes.length / 8
      Array.tabulate(n)(i => bb.getDouble(i * 8))
    } else {
      val n = bytes.length / 4
      Array.tabulate(n)(i => bb.getFloat(i * 4).toDouble)
    }
  }

  /** Parse one mzML file (pure; runs inside a task). */
  def parseFile(path: String): Seq[MzMlSpectrum] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // CDATA-wrapped base64 payloads must surface as CHARACTERS events
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = IoSource.open(path)
    val reader = factory.createXMLStreamReader(in)
    val fileName = IoSource.baseName(path)

    val out = mutable.ArrayBuffer.empty[MzMlSpectrum]

    var inSpectrum = false
    var specId: String = null
    var specIndex = -1L
    var msLevel = 0
    var precMz = 0.0
    var precCharge = 0
    var rt: Option[Double] = None
    var masses: Array[Double] = Array.empty
    var intensities: Array[Double] = Array.empty

    var inBinaryArray = false
    var is64 = false
    var zlib = false
    var isMz = false
    var isIntensity = false
    var inBinary = false
    val b64 = new StringBuilder

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
              inSpectrum = true
              specId = attr("id")
              specIndex = Option(attr("index")).map(_.toLong).getOrElse(out.size.toLong)
              msLevel = 0; precMz = 0.0; precCharge = 0; rt = None
              masses = Array.empty; intensities = Array.empty
            case "binaryDataArray" if inSpectrum =>
              inBinaryArray = true; is64 = false; zlib = false; isMz = false; isIntensity = false
            case "binary" if inBinaryArray =>
              inBinary = true; b64.clear()
            case "cvParam" if inSpectrum =>
              val acc = attr("accession")
              val value = attr("value")
              acc match {
                case "MS:1000511" => msLevel = Option(value).map(_.toInt).getOrElse(0)
                case "MS:1000744" => precMz = Option(value).map(_.toDouble).getOrElse(0.0)
                case "MS:1000041" => precCharge = Option(value).map(_.toInt).getOrElse(0)
                case "MS:1000016" =>
                  // normalize to seconds: writers commonly emit minutes
                  // (unitAccession UO:0000031)
                  val unit = attr("unitAccession")
                  val factor =
                    if (unit == "UO:0000031" ||
                      Option(attr("unitName")).exists(_.contains("minute"))) 60.0
                    else 1.0
                  rt = Option(value).map(_.toDouble * factor)
                case "MS:1000523" if inBinaryArray => is64 = true
                case "MS:1000521" if inBinaryArray => is64 = false
                case "MS:1000574" if inBinaryArray => zlib = true
                case "MS:1000514" if inBinaryArray => isMz = true
                case "MS:1000515" if inBinaryArray => isIntensity = true
                // MS-Numpress encodings (linear / pic / slof): NOT
                // implemented — reject loudly; decoding the numpress byte
                // stream as raw IEEE floats would yield silent garbage
                // masses/intensities (MS:1000576 = "no compression" is fine)
                case "MS:1002312" | "MS:1002313" | "MS:1002314" | "MS:1002746" |
                    "MS:1002747" | "MS:1002748" if inBinaryArray =>
                  throw new UnsupportedOperationException(
                    s"MzMlIO: unsupported binary compression $acc (MS-Numpress) " +
                      s"in $fileName — only zlib (MS:1000574) and uncompressed " +
                      "arrays are supported")
                case _ =>
              }
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inBinary =>
          b64.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "binary" => inBinary = false
            case "binaryDataArray" if inBinaryArray =>
              val peaks = decodePeaks(b64.toString, is64, zlib)
              if (isMz) masses = peaks else if (isIntensity) intensities = peaks
              inBinaryArray = false
              b64.clear()
            case "spectrum" =>
              out += MzMlSpectrum(fileName, specIndex, specId, msLevel, precMz,
                precCharge, rt, masses.toSeq, intensities.toSeq)
              inSpectrum = false
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    in.close()
    out.toSeq
  }

  /** Distributed scan: one task per file; output matches the MgfIO row
    * shape (plus the mzML native id as scanId) so the index pipeline can
    * union spectra sources. */
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
