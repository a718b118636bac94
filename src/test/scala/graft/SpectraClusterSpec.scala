package graft

import graft.functions.BinPeaksExpr
import graft.operators.SpectraCluster
import graft.pipeline.ClusterInference
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpectraClusterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def binned(masses: Seq[Double], intens: Seq[Double],
      width: Double, topK: Int): Seq[(Long, Double)] = {
    val df = Seq((masses, intens)).toDF("m", "i")
      .select(BinPeaksExpr.binPeaksCol(spark, col("m"), col("i"), width, topK).as("b"))
    val r = df.head()
    if (r.isNullAt(0)) null
    else r.getSeq[Row](0).map(x => (x.getLong(0), x.getDouble(1)))
  }

  test("BinPeaksExpr merges bins, filters junk peaks, keeps topK, sorts by bin") {
    // 100.2 and 100.9 share bin 100; 250.5 alone; junk: zero/negative/NaN
    // intensity, NaN mass
    val out = binned(
      Seq(100.2, 100.9, 250.5, 300.0, 301.0, Double.NaN, 400.0, 500.0),
      Seq(5.0, 7.0, 20.0, 1.0, 1.0, 9.0, -3.0, 0.0),
      1.0, 10)
    assert(out === Seq((100L, 12.0), (250L, 20.0), (300L, 1.0), (301L, 1.0)))

    // topK=2 keeps (250, 20) and (100, 12); output stays bin-ascending
    val top2 = binned(
      Seq(100.2, 100.9, 250.5, 300.0, 301.0),
      Seq(5.0, 7.0, 20.0, 1.0, 1.0),
      1.0, 2)
    assert(top2 === Seq((100L, 12.0), (250L, 20.0)))

    // weight tie broken by LOWER bin: (300,1.0) beats (301,1.0) at topK=3
    val tie = binned(
      Seq(100.2, 250.5, 300.0, 301.0),
      Seq(12.0, 20.0, 1.0, 1.0),
      1.0, 3)
    assert(tie === Seq((100L, 12.0), (250L, 20.0), (300L, 1.0)))

    // length mismatch => NULL, not truncation
    assert(binned(Seq(100.0, 200.0), Seq(1.0), 1.0, 5) === null)
  }

  private def spec(id: Long, pmz: Double, charge: Int,
      peaks: (Double, Double)*): (Long, Double, Int, Seq[Double], Seq[Double]) =
    (id, pmz, charge, peaks.map(_._1), peaks.map(_._2))

  private def toDf(rows: Seq[(Long, Double, Int, Seq[Double], Seq[Double])]): DataFrame =
    rows.toDF("specId", "precursorMz", "precursorCharge", "masses", "intensities")

  private val cfg = SpectraCluster.Config(
    binWidth = 1.0, topPeaks = 10, candidateBins = 4,
    precursorTol = 0.05, minCosine = 0.9, maxCandidateKeyDf = 0L)

  test("clusterSpectra: identical spectra cluster; precursor and charge gates hold") {
    val spectra = toDf(Seq(
      spec(1L, 500.00, 2, (100.0, 10.0), (200.0, 20.0), (300.0, 5.0)),
      spec(2L, 500.02, 2, (100.0, 10.0), (200.0, 20.0), (300.0, 5.0)), // pairs with 1
      spec(3L, 500.00, 3, (100.0, 10.0), (200.0, 20.0), (300.0, 5.0)), // charge gate
      spec(4L, 501.00, 2, (100.0, 10.0), (200.0, 20.0), (300.0, 5.0)), // precursor gate
      spec(5L, 500.00, 2, (150.0, 10.0), (250.0, 20.0), (350.0, 5.0)), // disjoint bins
    ))
    val got = SpectraCluster.clusterSpectra(spectra, cfg)
      .orderBy("specId").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 5L)))
  }

  test("clusterSpectra: transitive chain closes through connected components") {
    // 1-2 within tol, 2-3 within tol, 1-3 NOT (0.08 > 0.05): one cluster of 3
    val spectra = toDf(Seq(
      spec(1L, 500.00, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(2L, 500.04, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(3L, 500.08, 2, (100.0, 10.0), (200.0, 20.0)),
    ))
    val edges = SpectraCluster.similarityEdges(spectra, cfg)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (2L, 3L)))
    val got = SpectraCluster.clusterSpectra(spectra, cfg)
      .orderBy("specId").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("clusterSpectra: unparseable spectra come back as singletons") {
    val spectra = toDf(Seq(
      spec(1L, 500.00, 2, (100.0, 10.0)),
      spec(2L, 500.00, 2), // no peaks at all
      spec(3L, 500.00, 2, (100.0, -5.0)), // only junk peaks
    ))
    val got = SpectraCluster.clusterSpectra(spectra, cfg)
      .orderBy("specId").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("clusterSpectra: non-finite precursorMz becomes a singleton, not a job crash") {
    // floor(Infinity/tol) narrows to Long.MaxValue and the probe bucket+1
    // overflowed under ANSI — one corrupt spectrum killed the whole job
    val spectra = toDf(Seq(
      spec(1L, 500.00, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(2L, 500.02, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(3L, Double.PositiveInfinity, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(4L, Double.NaN, 2, (100.0, 10.0), (200.0, 20.0)),
    ))
    val got = SpectraCluster.clusterSpectra(spectra, cfg)
      .orderBy("specId").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L)))
  }

  test("Config rejects NaN/out-of-range minCosine") {
    intercept[IllegalArgumentException] {
      SpectraCluster.Config(minCosine = Double.NaN)
    }
    intercept[IllegalArgumentException] {
      SpectraCluster.Config(minCosine = 1.5)
    }
  }

  test("hot candidate keys are dropped by the df cap, restored when disabled") {
    // 5 near-identical spectra in one precursor bucket: every candidate
    // key indexes all 5. Cap of 4 kills all pairing; cap 0 restores it.
    val rows = (1L to 5L).map(i => spec(i, 500.00, 2, (100.0, 10.0), (200.0, 20.0)))
    val spectra = toDf(rows)
    val capped = SpectraCluster.similarityEdges(
      spectra, cfg.copy(maxCandidateKeyDf = 4L)).count()
    assert(capped === 0L)
    val open = SpectraCluster.similarityEdges(spectra, cfg).count()
    assert(open === 10L) // all C(5,2) pairs
  }

  test("native clusterer output drives ClusterInference end-to-end") {
    // Two identical ELVIS spectra + one PEPTIDE singleton; the native
    // cluster assignment feeds the A10-A12 inference unchanged.
    val spectra = toDf(Seq(
      spec(10L, 500.00, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(11L, 500.01, 2, (100.0, 10.0), (200.0, 20.0)),
      spec(12L, 900.00, 2, (400.0, 10.0), (500.0, 20.0)),
    ))
    val assignments = SpectraCluster.clusterSpectra(spectra, cfg)
    val mapping = Seq(
      ("run1.mgf", 0L, 10L), ("run1.mgf", 1L, 11L), ("run1.mgf", 2L, 12L),
    ).toDF("file", "spectrumIndex", "specId")
    val clusters = SpectraCluster.asMaraClusterRows(mapping, assignments)
    assert(clusters.columns.toSeq === Seq("file", "spectrumIndex", "clusterId"))

    val psm = Seq(
      (0L, "mzspec:PXD1:run1:index:1", "ELVISLIVESK", "ELVISLIVESK/2", false, 0.01),
      (1L, "mzspec:PXD1:run1:index:2", "ELVISLIVESK", "ELVISLIVESK/2", false, 0.02),
      (2L, "mzspec:PXD1:run1:index:3", "PEPTIDEK", "PEPTIDEK/2", false, 0.03),
    ).toDF("index", "usi", "peptideSequence", "peptidoform", "isDecoy", "score")
    val out = ClusterInference.run(psm, clusters.withColumn("spectrumIndex",
      col("spectrumIndex").cast("long")))
    val reps = out.representatives.select("usi").as[String].collect().toSet
    // best-scoring member of the pure 2-cluster + the singleton
    assert(reps === Set("mzspec:PXD1:run1:index:1", "mzspec:PXD1:run1:index:3"))
  }
}
