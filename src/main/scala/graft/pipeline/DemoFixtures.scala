package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.Base64

/** Deterministic on-disk fixtures for the driver-visible IO demo queries
  * (FIXTURES.md §3): one spectra file per supported reference format
  * (SubmissionPipelineUtils.java:106-142 FileType inventory), a compact
  * mzIdentML, a recorded REST files payload, and an SDRF slice. Content is
  * constant, so the expected-table oracles pin every parsed value. */
object DemoFixtures {

  private def b64doubles(xs: Seq[Double], littleEndian: Boolean = true): String = {
    val bb = ByteBuffer.allocate(xs.length * 8)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    xs.foreach(bb.putDouble)
    Base64.getEncoder.encodeToString(bb.array())
  }

  val mgf: String =
    """BEGIN IONS
      |TITLE=spec0
      |PEPMASS=445.12
      |CHARGE=2+
      |RTINSECONDS=12.5
      |100.0	10.0
      |200.0	20.0
      |END IONS
      |BEGIN IONS
      |TITLE=spec1
      |PEPMASS=512.75 1234.1
      |CHARGE=3+
      |55.5	1.0
      |END IONS
      |""".stripMargin

  val pkl: String =
    """445.50 1000.0 2
      |100.0 10.0
      |200.0 20.0
      |
      |600.25 500.0 3
      |300.0 30.0
      |""".stripMargin

  def mzML: String = {
    val mz64 = b64doubles(Seq(100.5, 200.25))
    val in64 = b64doubles(Seq(10.0, 20.0))
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<mzML xmlns="http://psi.hupo.org/ms/mzml">
       | <run><spectrumList count="2">
       |  <spectrum index="0" id="controllerType=0 controllerNumber=1 scan=1">
       |   <cvParam accession="MS:1000511" value="2"/>
       |   <cvParam accession="MS:1000016" value="12.5"/>
       |   <precursorList><precursor><selectedIonList><selectedIon>
       |    <cvParam accession="MS:1000744" value="445.12"/>
       |    <cvParam accession="MS:1000041" value="2"/>
       |   </selectedIon></selectedIonList></precursor></precursorList>
       |   <binaryDataArrayList>
       |    <binaryDataArray><cvParam accession="MS:1000523"/><cvParam accession="MS:1000514"/>
       |     <binary>$mz64</binary></binaryDataArray>
       |    <binaryDataArray><cvParam accession="MS:1000523"/><cvParam accession="MS:1000515"/>
       |     <binary>$in64</binary></binaryDataArray>
       |   </binaryDataArrayList>
       |  </spectrum>
       |  <spectrum index="1" id="controllerType=0 controllerNumber=1 scan=2">
       |   <cvParam accession="MS:1000511" value="1"/>
       |  </spectrum>
       | </spectrumList></run>
       |</mzML>""".stripMargin
  }

  def mzXML: String = {
    val bb = ByteBuffer.allocate(32).order(ByteOrder.BIG_ENDIAN)
    Seq(100.5, 10.0, 200.25, 20.0).foreach(bb.putDouble)
    val peaks = Base64.getEncoder.encodeToString(bb.array())
    s"""<?xml version="1.0"?>
       |<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2">
       | <msRun scanCount="1">
       |  <scan num="7" msLevel="2" retentionTime="PT33.5S">
       |   <precursorMz precursorCharge="2">445.12</precursorMz>
       |   <peaks precision="64" byteOrder="network">$peaks</peaks>
       |  </scan>
       | </msRun>
       |</mzXML>""".stripMargin
  }

  val ms2: String =
    """H	Extractor	graft-demo
      |S	7	7	445.50
      |Z	2	890.99
      |100.0 10.0
      |200.0 20.0
      |S	9	9	600.25
      |300.0 30.0
      |""".stripMargin

  val dta: String = "890.99 2\n100.0 10.0\n200.0 20.0\n"

  val apl: String =
    """peaklist start
      |mz=445.12
      |charge=2
      |header=RawFile: r1 Index: 5
      |100.0	10.0
      |200.0	20.0
      |peaklist end
      |""".stripMargin

  /** PRIDE XML (mzData core): CDATA-wrapped base64 arrays exercise the
    * IS_COALESCING path (SubmissionPipelineUtils.java:281-289 USI shape). */
  def prideXml: String = {
    val mz = b64doubles(Seq(100.5, 200.25))
    val in = b64doubles(Seq(10.0, 20.0))
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<ExperimentCollection version="2.1">
       | <Experiment><mzData>
       |  <spectrumList count="1">
       |   <spectrum id="3">
       |    <spectrumDesc><spectrumSettings>
       |     <spectrumInstrument msLevel="2"/>
       |    </spectrumSettings>
       |    <precursorList><precursor><ionSelection>
       |     <cvParam cvLabel="psi" accession="PSI:1000040" name="m/z" value="445.12"/>
       |     <cvParam cvLabel="psi" accession="PSI:1000041" name="charge" value="2"/>
       |     <cvParam cvLabel="psi" accession="PSI:1000039" name="rt" value="33.5"/>
       |    </ionSelection></precursor></precursorList></spectrumDesc>
       |    <mzArrayBinary><data precision="64" endian="little"><![CDATA[$mz]]></data></mzArrayBinary>
       |    <intenArrayBinary><data precision="64" endian="little"><![CDATA[$in]]></data></intenArrayBinary>
       |   </spectrum>
       |  </spectrumList>
       | </mzData></Experiment>
       |</ExperimentCollection>""".stripMargin
  }

  /** Self-contained PRIDE XML result file: mzData spectra PLUS
    * identification sections (GelFreeIdentification and
    * TwoDimensionalIdentification — the legacy identification input,
    * JmzReaderSpectrumService.java:43-45). Exercises: shared peptide under
    * two accessions (one content-derived psmId), positioned PSI-MOD
    * modification, PeptideItem-level score/charge cvParams, the
    * Identification-<Score> fallback, and the PRIDE:0000303 decoy-hit
    * flag. */
  def prideXmlIdent: String = {
    val mz = b64doubles(Seq(100.5, 200.25))
    val in = b64doubles(Seq(10.0, 20.0))
    def spectrum(id: Int, precMz: Double): String =
      s"""   <spectrum id="$id">
         |    <spectrumDesc><spectrumSettings>
         |     <spectrumInstrument msLevel="2"/>
         |    </spectrumSettings>
         |    <precursorList><precursor><ionSelection>
         |     <cvParam cvLabel="psi" accession="PSI:1000040" name="m/z" value="$precMz"/>
         |     <cvParam cvLabel="psi" accession="PSI:1000041" name="charge" value="2"/>
         |    </ionSelection></precursor></precursorList></spectrumDesc>
         |    <mzArrayBinary><data precision="64" endian="little">$mz</data></mzArrayBinary>
         |    <intenArrayBinary><data precision="64" endian="little">$in</data></intenArrayBinary>
         |   </spectrum>""".stripMargin
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<ExperimentCollection version="2.1">
       | <Experiment>
       |  <mzData>
       |  <spectrumList count="3">
       |${spectrum(1, 458.23)}
       |${spectrum(2, 607.38)}
       |${spectrum(3, 524.76)}
       |  </spectrumList>
       | </mzData>
       | <GelFreeIdentification>
       |  <Accession>sp|A1</Accession>
       |  <Database>SWISSPROT</Database>
       |  <PeptideItem>
       |   <Sequence>PEPTIDEK</Sequence>
       |   <Start>10</Start>
       |   <End>17</End>
       |   <SpectrumReference>1</SpectrumReference>
       |   <ModificationItem>
       |    <ModLocation>3</ModLocation>
       |    <ModAccession>MOD:00696</ModAccession>
       |    <ModDatabase>MOD</ModDatabase>
       |   </ModificationItem>
       |   <additional>
       |    <cvParam cvLabel="PRIDE" accession="PRIDE:0000069" name="Mascot score" value="47.15"/>
       |   </additional>
       |  </PeptideItem>
       |  <PeptideItem>
       |   <Sequence>ELVISLIVESK</Sequence>
       |   <SpectrumReference>2</SpectrumReference>
       |   <additional>
       |    <cvParam cvLabel="PRIDE" accession="PRIDE:0000069" name="Mascot score" value="30.5"/>
       |    <cvParam cvLabel="MS" accession="MS:1000041" name="charge state" value="2"/>
       |   </additional>
       |  </PeptideItem>
       |  <Score>47.15</Score>
       |  <Threshold>20.0</Threshold>
       |  <SearchEngine>Mascot</SearchEngine>
       | </GelFreeIdentification>
       | <GelFreeIdentification>
       |  <Accession>sp|A2</Accession>
       |  <PeptideItem>
       |   <Sequence>ELVISLIVESK</Sequence>
       |   <SpectrumReference>2</SpectrumReference>
       |   <additional>
       |    <cvParam cvLabel="PRIDE" accession="PRIDE:0000069" name="Mascot score" value="30.5"/>
       |    <cvParam cvLabel="MS" accession="MS:1000041" name="charge state" value="2"/>
       |   </additional>
       |  </PeptideItem>
       | </GelFreeIdentification>
       | <TwoDimensionalIdentification>
       |  <Accession>DECOY_sp|A9</Accession>
       |  <PeptideItem>
       |   <Sequence>DECOYPEPK</Sequence>
       |   <SpectrumReference>3</SpectrumReference>
       |  </PeptideItem>
       |  <Score>5.0</Score>
       |  <additional>
       |   <cvParam cvLabel="PRIDE" accession="PRIDE:0000303" name="Decoy hit"/>
       |  </additional>
       | </TwoDimensionalIdentification>
       | </Experiment>
       |</ExperimentCollection>""".stripMargin
  }

  def prideXmlIdentFile(): String = {
    val dir = Files.createTempDirectory("graft-demo-pridexml")
    Files.writeString(dir.resolve("legacy_ident.xml"), prideXmlIdent).toString
  }

  /** Writes one file per spectra format into a fresh temp dir; the
    * readSpectraDir union over it covers every reference FileType (S2). */
  def spectraFormatsDir(): String = {
    val dir = Files.createTempDirectory("graft-demo-formats")
    def w(name: String, content: String): Path =
      Files.writeString(dir.resolve(name), content)
    w("run1.mgf", mgf)
    w("run.pkl", pkl)
    w("run2.mzML", mzML)
    w("run3.mzXML", mzXML)
    w("run.ms2", ms2)
    w("one.dta", dta)
    w("run.apl", apl)
    w("legacy.xml", prideXml)
    dir.toString
  }

  /** mzIdentML covering SpectraData id formats, positioned UNIMOD mods,
    * decoy evidence, and known-accession score selection (S1). */
  val mzid: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1">
      | <SequenceCollection>
      |  <DBSequence id="dbs1" accession="sp|Q1"/>
      |  <DBSequence id="dbs2" accession="DECOY_sp|Q2"/>
      |  <Peptide id="pep1"><PeptideSequence>PEPTIDEK</PeptideSequence>
      |   <Modification location="3" monoisotopicMassDelta="15.994915">
      |    <cvParam accession="UNIMOD:35" name="Oxidation" cvRef="UNIMOD"/>
      |   </Modification>
      |  </Peptide>
      |  <Peptide id="pep2"><PeptideSequence>ELVISLIVESK</PeptideSequence></Peptide>
      |  <PeptideEvidence id="ev1" peptide_ref="pep1" dBSequence_ref="dbs1" isDecoy="false"/>
      |  <PeptideEvidence id="ev2" peptide_ref="pep2" dBSequence_ref="dbs2" isDecoy="true"/>
      | </SequenceCollection>
      | <DataCollection><Inputs>
      |  <SpectraData id="sd1" location="file://data/run1.mgf">
      |   <SpectrumIDFormat><cvParam accession="MS:1000774" name="multiple peak list nativeID format"/></SpectrumIDFormat>
      |  </SpectraData>
      |  <SpectraData id="sd2" location="file://data/run2.mzML">
      |   <SpectrumIDFormat><cvParam accession="MS:1001530" name="mzML unique identifier"/></SpectrumIDFormat>
      |  </SpectraData>
      | </Inputs>
      | <AnalysisData>
      |  <SpectrumIdentificationList>
      |   <SpectrumIdentificationResult id="r1" spectrumID="index=0" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii1" rank="1" chargeState="2"
      |      experimentalMassToCharge="458.23" calculatedMassToCharge="458.22" peptide_ref="pep1">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev1"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.001"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |   <SpectrumIdentificationResult id="r2" spectrumID="controllerType=0 controllerNumber=1 scan=7" spectraData_ref="sd2">
      |    <SpectrumIdentificationItem id="sii2" rank="1" chargeState="3"
      |      experimentalMassToCharge="600.0" calculatedMassToCharge="600.1" peptide_ref="pep2">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev2"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.02"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |  </SpectrumIdentificationList>
      | </AnalysisData>
      | </DataCollection>
      |</MzIdentML>
      |""".stripMargin

  def mzidFile(): String = {
    val dir = Files.createTempDirectory("graft-demo-mzid")
    Files.writeString(dir.resolve("assay.mzid"), mzid).toString
  }

  private def mzidShell(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1">
       |$body
       |</MzIdentML>
       |""".stripMargin

  /** Multi-result-file fixture (PIAModelerService.java:191-219 combined
    * runs): two mzids over ONE spectra file with an overlapping spectrum.
    *  - a.mzid: PEPTIDEK on index=0 (rank 1) plus a BETTER-scoring rank-2
    *    identification of the same spectrum whose psmId sorts first —
    *    visible in the output iff the setAllTopIdentifications(1) rank
    *    gate is missing; ELVISLIVESK on index=1 at 0.01; a decoy.
    *  - b.mzid: the SAME spectrum index=1 as the same peptide/charge at a
    *    better 0.002 (the PSM set collapses to this member —
    *    createPSMSets(true)); AAAAKPEPR on index=3.
    * Scores are Comet expectation values: lower is better. */
  val mzidMultiA: String = mzidShell(
    """ <SequenceCollection>
      |  <DBSequence id="dbs1" accession="sp|Q1"/>
      |  <DBSequence id="dbs3" accession="sp|Q3"/>
      |  <DBSequence id="dbs5" accession="sp|Q5"/>
      |  <DBSequence id="dbs7" accession="DECOY_sp|Q7"/>
      |  <DBSequence id="dbs9" accession="sp|Q9"/>
      |  <Peptide id="pep1"><PeptideSequence>PEPTIDEK</PeptideSequence></Peptide>
      |  <Peptide id="pep2"><PeptideSequence>ELVISLIVESK</PeptideSequence></Peptide>
      |  <Peptide id="pep7"><PeptideSequence>DECOYPEPK</PeptideSequence></Peptide>
      |  <Peptide id="pep9"><PeptideSequence>RANKTWOPEPK</PeptideSequence></Peptide>
      |  <PeptideEvidence id="ev1" peptide_ref="pep1" dBSequence_ref="dbs1" isDecoy="false"/>
      |  <PeptideEvidence id="ev2" peptide_ref="pep2" dBSequence_ref="dbs3" isDecoy="false"/>
      |  <PeptideEvidence id="ev2b" peptide_ref="pep2" dBSequence_ref="dbs5" isDecoy="false"/>
      |  <PeptideEvidence id="ev7" peptide_ref="pep7" dBSequence_ref="dbs7" isDecoy="true"/>
      |  <PeptideEvidence id="ev9" peptide_ref="pep9" dBSequence_ref="dbs9" isDecoy="false"/>
      | </SequenceCollection>
      | <DataCollection><Inputs>
      |  <SpectraData id="sd1" location="file://data/run1.mgf">
      |   <SpectrumIDFormat><cvParam accession="MS:1000774" name="multiple peak list nativeID format"/></SpectrumIDFormat>
      |  </SpectraData>
      | </Inputs>
      | <AnalysisData>
      |  <SpectrumIdentificationList>
      |   <SpectrumIdentificationResult id="r1" spectrumID="index=0" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii0" rank="2" chargeState="2"
      |      experimentalMassToCharge="650.37" calculatedMassToCharge="650.37" peptide_ref="pep9">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev9"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.0005"/>
      |    </SpectrumIdentificationItem>
      |    <SpectrumIdentificationItem id="sii1" rank="1" chargeState="2"
      |      experimentalMassToCharge="458.23" calculatedMassToCharge="458.22" peptide_ref="pep1">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev1"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.001"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |   <SpectrumIdentificationResult id="r2" spectrumID="index=1" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii2" rank="1" chargeState="2"
      |      experimentalMassToCharge="607.38" calculatedMassToCharge="607.38" peptide_ref="pep2">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev2"/>
      |     <PeptideEvidenceRef peptideEvidence_ref="ev2b"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.01"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |   <SpectrumIdentificationResult id="r3" spectrumID="index=2" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii3" rank="1" chargeState="2"
      |      experimentalMassToCharge="524.76" calculatedMassToCharge="524.76" peptide_ref="pep7">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev7"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.9"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |  </SpectrumIdentificationList>
      | </AnalysisData>
      | </DataCollection>""".stripMargin)

  val mzidMultiB: String = mzidShell(
    """ <SequenceCollection>
      |  <DBSequence id="dbs3" accession="sp|Q3"/>
      |  <DBSequence id="dbs4" accession="sp|Q4"/>
      |  <Peptide id="pep2"><PeptideSequence>ELVISLIVESK</PeptideSequence></Peptide>
      |  <Peptide id="pep4"><PeptideSequence>AAAAKPEPR</PeptideSequence></Peptide>
      |  <PeptideEvidence id="ev2" peptide_ref="pep2" dBSequence_ref="dbs3" isDecoy="false"/>
      |  <PeptideEvidence id="ev4" peptide_ref="pep4" dBSequence_ref="dbs4" isDecoy="false"/>
      | </SequenceCollection>
      | <DataCollection><Inputs>
      |  <SpectraData id="sd1" location="file://data/run1.mgf">
      |   <SpectrumIDFormat><cvParam accession="MS:1000774" name="multiple peak list nativeID format"/></SpectrumIDFormat>
      |  </SpectraData>
      | </Inputs>
      | <AnalysisData>
      |  <SpectrumIdentificationList>
      |   <SpectrumIdentificationResult id="r1" spectrumID="index=1" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii1" rank="1" chargeState="2"
      |      experimentalMassToCharge="607.38" calculatedMassToCharge="607.38" peptide_ref="pep2">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev2"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.002"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |   <SpectrumIdentificationResult id="r2" spectrumID="index=3" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii2" rank="1" chargeState="2"
      |      experimentalMassToCharge="456.76" calculatedMassToCharge="456.76" peptide_ref="pep4">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev4"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.005"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |  </SpectrumIdentificationList>
      | </AnalysisData>
      | </DataCollection>""".stripMargin)

  /** Third result file for the combined run: identifies ONLY the shared
    * spectrum (index=1, same peptide/charge, worst score 0.9) but declares
    * a CONFLICTING SpectrumIDFormat for run1.mgf (MS:1000768 spectrum
    * nativeID, vs a/b's MS:1000774 index addressing). The merged set must
    * take the winning member's (b.mzid) idFormat: if this loser's format
    * ever won, the set's scanKey would be derived as a nativeID, the J1
    * join against the index-keyed MGF spectra would miss, and the
    * ELVISLIVESK row — USI index:2 after the 1-based MGF index
    * correction — would vanish from the pinned 4-row output. */
  val mzidMultiC: String = mzidShell(
    """ <SequenceCollection>
      |  <DBSequence id="dbs3" accession="sp|Q3"/>
      |  <Peptide id="pep2"><PeptideSequence>ELVISLIVESK</PeptideSequence></Peptide>
      |  <PeptideEvidence id="ev2" peptide_ref="pep2" dBSequence_ref="dbs3" isDecoy="false"/>
      | </SequenceCollection>
      | <DataCollection><Inputs>
      |  <SpectraData id="sd1" location="file://data/run1.mgf">
      |   <SpectrumIDFormat><cvParam accession="MS:1000768" name="spectrum identifier nativeID format"/></SpectrumIDFormat>
      |  </SpectraData>
      | </Inputs>
      | <AnalysisData>
      |  <SpectrumIdentificationList>
      |   <SpectrumIdentificationResult id="r1" spectrumID="index=1" spectraData_ref="sd1">
      |    <SpectrumIdentificationItem id="sii1" rank="1" chargeState="2"
      |      experimentalMassToCharge="607.38" calculatedMassToCharge="607.38" peptide_ref="pep2">
      |     <PeptideEvidenceRef peptideEvidence_ref="ev2"/>
      |     <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.9"/>
      |    </SpectrumIdentificationItem>
      |   </SpectrumIdentificationResult>
      |  </SpectrumIdentificationList>
      | </AnalysisData>
      | </DataCollection>""".stripMargin)

  /** A 4-spectrum MGF matching the multi-file mzids' index addressing. */
  val mgfMulti: String = (0 to 3).map { i =>
    s"""BEGIN IONS
       |TITLE=mspec$i
       |PEPMASS=${440.0 + i}
       |CHARGE=2+
       |100.0\t10.0
       |200.0\t20.0
       |END IONS""".stripMargin
  }.mkString("", "\n", "\n")

  /** Writes the three mzids + spectra dir; returns (mzidPaths, spectraDir). */
  def multiFileFixture(): (Seq[String], String) = {
    val dir = Files.createTempDirectory("graft-demo-multifile")
    val a = Files.writeString(dir.resolve("a.mzid"), mzidMultiA).toString
    val b = Files.writeString(dir.resolve("b.mzid"), mzidMultiB).toString
    val c = Files.writeString(dir.resolve("c.mzid"), mzidMultiC).toString
    val spectraDir = Files.createDirectory(dir.resolve("spectra"))
    Files.writeString(spectraDir.resolve("run1.mgf"), mgfMulti)
    (Seq(a, b, c), spectraDir.toString)
  }

  /** Recorded REST files payload (S4 shape, PrideFile.java:12-68): mixes
    * RESULT/PEAK categories, the PRIDE:1002848 generated-result exclusion,
    * pride.mgf generated artifacts, compressed names, and ftp URLs. */
  val restFilesJson: String =
    """[
      |{"accession":"PXF1","fileName":"assay1.mzid","publicationDate":"2020-01-15","fileCategory":{"accession":"PRIDE:1002847","value":"RESULT"},"ftp":"ftp://ftp.pride.ebi.ac.uk/2020/01/PXD1/assay1.mzid"},
      |{"accession":"PXF2","fileName":"run1.mgf.gz","publicationDate":"2020-01-15","fileCategory":{"accession":"PRIDE:1002846","value":"PEAK"},"ftp":"ftp://ftp.pride.ebi.ac.uk/2020/01/PXD1/run1.mgf.gz"},
      |{"accession":"PXF3","fileName":"junk.mztab","publicationDate":"2020-02-01","fileCategory":{"accession":"PRIDE:1002848","value":"RESULT"},"ftp":"ftp://ftp.pride.ebi.ac.uk/2020/02/PXD1/junk.mztab"},
      |{"accession":"PXF4","fileName":"pride.mgf","publicationDate":"2020-02-01","fileCategory":{"accession":"PRIDE:1002846","value":"PEAK"},"ftp":"ftp://ftp.pride.ebi.ac.uk/2020/02/PXD1/pride.mgf"},
      |{"accession":"PXF5","fileName":"other.zip","publicationDate":"2020-03-10","fileCategory":{"accession":"PRIDE:1002846","value":"PEAK"},"ftp":"ftp://ftp.pride.ebi.ac.uk/2020/03/PXD1/other.zip"}
      |]""".stripMargin

  /** SDRF-Proteomics slice (S7): characteristics melt + EFO resolution +
    * an unknown characteristic carrying a null accession. */
  val sdrf: String =
    Seq(
      Seq("source name", "characteristics[organism]", "characteristics[organism part]",
        "characteristics[spiked compound]", "comment[data file]").mkString("\t"),
      Seq("sample 1", "Homo sapiens", "liver", "yes", "run1.raw").mkString("\t"),
      Seq("sample 2", "Mus musculus", "brain", "no", "run2.raw").mkString("\t"),
    ).mkString("", "\n", "\n")

  def sdrfFile(): String = {
    val dir = Files.createTempDirectory("graft-demo-sdrf")
    Files.writeString(dir.resolve("sample.sdrf.tsv"), sdrf).toString
  }
}
