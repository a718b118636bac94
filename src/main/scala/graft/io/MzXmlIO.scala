package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64
import java.util.zip.Inflater

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** mzXML spectra source (SURVEY.md §2.1 S2, mzXML branch; scan-number
  * addressed). Public mzXML schema: `<scan num= msLevel=
  * retentionTime="PT..S">` with `<precursorMz precursorCharge=>` text and
  * `<peaks>` base64 of interleaved (m/z, intensity) pairs in NETWORK
  * (big-endian) byte order, precision 32/64, optional zlib. */
object MzXmlIO {

  final case class MzXmlSpectrum(
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
      base64: String, is64bit: Boolean, zlib: Boolean): (Array[Double], Array[Double]) = {
    if (base64 == null || base64.trim.isEmpty) return (Array.empty, Array.empty)
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
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val step = if (is64bit) 8 else 4
    val nPairs = bytes.length / (2 * step)
    val mz = new Array[Double](nPairs)
    val inten = new Array[Double](nPairs)
    var i = 0
    while (i < nPairs) {
      if (is64bit) { mz(i) = bb.getDouble; inten(i) = bb.getDouble }
      else { mz(i) = bb.getFloat.toDouble; inten(i) = bb.getFloat.toDouble }
      i += 1
    }
    (mz, inten)
  }

  private def parseRt(s: String): Option[Double] =
    Option(s).flatMap { v =>
      val m = "PT([0-9.]+)S".r.findFirstMatchIn(v)
      m.map(_.group(1).toDouble)
    }

  def parseFile(path: String): Seq[MzXmlSpectrum] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // CDATA-wrapped base64 payloads must surface as CHARACTERS events
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val in = IoSource.open(path)
    val reader = factory.createXMLStreamReader(in)
    val fileName = IoSource.baseName(path)

    val out = mutable.ArrayBuffer.empty[MzXmlSpectrum]
    var num: String = null
    var msLevel = 0
    var rt: Option[Double] = None
    var precMz = 0.0
    var precCharge = 0
    var is64 = false
    var zlib = false
    var inPeaks = false
    var inPrecursor = false
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
            case "scan" =>
              num = attr("num")
              msLevel = Option(attr("msLevel")).map(_.toInt).getOrElse(0)
              rt = parseRt(attr("retentionTime"))
              precMz = 0.0; precCharge = 0
            case "precursorMz" =>
              inPrecursor = true; text.clear()
              precCharge = Option(attr("precursorCharge")).map(_.toInt).getOrElse(0)
            case "peaks" =>
              inPeaks = true; text.clear()
              is64 = Option(attr("precision")).contains("64")
              zlib = Option(attr("compressionType")).contains("zlib")
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inPeaks || inPrecursor =>
          text.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "precursorMz" =>
              precMz = text.toString.trim.toDouble; inPrecursor = false
            case "peaks" =>
              val (mz, inten) = decodePeaks(text.toString, is64, zlib)
              out += MzXmlSpectrum(fileName, out.size.toLong, num, msLevel,
                precMz, precCharge, rt, mz.toSeq, inten.toSeq)
              inPeaks = false
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    in.close()
    out.toSeq
  }

  /** Distributed scan matching the common spectra row shape. */
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
