package graft

import java.nio.file.Files

import graft.io.ArchiveJson
import org.scalatest.funsuite.AnyFunSuite

/** Golden JSON shape (FIXTURES.md §4 / SURVEY §7.4 item 6): the written
  * JSON-lines field names must match the reference's Jackson output so
  * hash-equality comparisons over outputs hold. */
class JsonParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("archive spectrum JSON carries the reference field names") {
    val out = graft.pipeline.DemoAssay.runIndex(spark).archiveSpectra
    val dir = Files.createTempDirectory("graft-jsonparity").toString + "/spectra"
    ArchiveJson.write(out, dir)
    val line = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq).head

    val expectedKeys = Seq(
      "usi", "spectraUsi", "projectAccession", "assayAccession",
      "peptideSequence", "peptidoform", "isDecoy", "isValid", "retentionTime",
      "msLevel", "precursorCharge", "precursorMz", "masses", "intensities",
      "numPeaks", "missedCleavages", "proteinAccessions", "modifications",
      "bestSearchEngineScore", "scores", "properties", "sampleProperties",
      "qualityEstimationMethods")
    expectedKeys.foreach(k => assert(line.contains("\"" + k + "\""), s"missing key $k"))
    // nested param shape
    assert(line.contains("\"accession\"") && line.contains("\"name\"") && line.contains("\"value\""))
  }

  test("typed summary and protein-evidence round-trips decode") {
    val out = graft.pipeline.DemoAssay.runIndex(spark)
    val dir = Files.createTempDirectory("graft-typed").toString
    ArchiveJson.write(out.psmSummaries, s"$dir/summaries")
    ArchiveJson.write(out.proteinEvidence, s"$dir/proteins")
    val sums = ArchiveJson.readSummaries(spark, s"$dir/summaries").collect()
    assert(sums.length == 3 && sums.forall(_.usi.startsWith("mzspec:")))
    val prots = ArchiveJson.readProteinEvidence(spark, s"$dir/proteins").collect()
    assert(prots.length == 2 && prots.forall(_.psmAccessions.nonEmpty))
  }

  test("round-trip: write then schema-locked read preserves rows") {
    val out = graft.pipeline.DemoAssay.runIndex(spark).archiveSpectra
    val dir = Files.createTempDirectory("graft-rt").toString + "/spectra"
    ArchiveJson.write(out, dir)
    val back = ArchiveJson.read(spark, dir)
    assert(back.count() == out.count())
    assert(ArchiveJson.validate(back).count() == out.count())
    // typed view decodes
    assert(ArchiveJson.readTyped(spark, dir).collect().forall(_.usi.startsWith("mzspec:")))
  }
}
