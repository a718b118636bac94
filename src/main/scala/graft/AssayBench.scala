package graft

import graft.pipeline.IndexPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-assay throughput benchmark against the reference envelope.
  *
  * The largest observed assay in the reference corpus is 800,790 PSMs
  * (BASELINE.md: PXD003613), processed within a 4-CPU / 14 GB / 10 h
  * Nextflow task. This main synthesizes an assay of SPARK_GRAFT_NPSMS
  * PSMs (default 800,000, ~20 peptides repeated per spectrum pattern,
  * 10% decoys, 60-peak spectra) and runs the full generate-index-files
  * DAG — FDR, repair, filters, scan-key join, USI/peptidoform, delta-mass,
  * protein evidence — materializing through the noop sink.
  *
  * Prints one JSON line: {"metric":"assay_index_sec", ...}.
  */
object AssayBench {
  def main(args: Array[String]): Unit = {
    val nPsms = sys.env.getOrElse("SPARK_GRAFT_NPSMS", "800000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") // reference envelope: 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nSpectra = nPsms // one spectrum per PSM
    val aas = "ACDEFGHIKLMNPQRSTVWY"

    val psms = spark.range(nPsms.toLong).select(
      col("id").cast("string").as("psmId"),
      concat_ws("", (0 until 12).map(i =>
        substring(lit(aas), (pmod(col("id") * (i + 7), lit(20)) + 1).cast("int"), lit(1))): _*)
        .as("peptideSequence"),
      concat(lit("sp|PROT"), pmod(col("id"), lit(2000)).cast("string")).as("proteinAccession"),
      (pmod(col("id"), lit(10)) === 0).as("isDecoy"),
      // decoys score low so the FDR gate passes most targets — the bench
      // must drive the join/projection stages with realistic volume
      when(pmod(col("id"), lit(10)) === 0, rand(42) * 10)
        .otherwise(lit(20.0) + rand(43) * 80).as("score"),
      (pmod(col("id"), lit(3)) + 2).cast("int").as("charge"),
      (lit(400.0) + pmod(col("id"), lit(1000)) / 2.0).as("expMassToCharge"),
      (lit(400.0) + pmod(col("id"), lit(1000)) / 2.0).as("calcMassToCharge"),
      when(pmod(col("id"), lit(5)) === 0, map(lit(3), lit("UNIMOD:35")))
        .otherwise(map().cast("map<int,string>")).as("modifications"),
      concat(lit("index="), col("id").cast("string")).as("sourceId"),
      lit("run1.mgf").as("fileName"),
      lit(graft.functions.UsiFunctions.IdFormat.MultiPeakListNativeId).as("idFormat"),
      lit("MGF").as("fileType"),
      lit(null).cast("double").as("retentionTime"),
    )

    val peaks = sequence(lit(1), lit(60))
    val spectra = spark.range(nSpectra.toLong).select(
      lit("run1.mgf").as("fileName"),
      col("id").as("index"),
      col("id").cast("string").as("scanId"),
      lit("t").as("title"),
      lit(2).as("msLevel"),
      (lit(400.0) + pmod(col("id"), lit(1000)) / 2.0).as("precursorMz"),
      lit(2).as("precursorCharge"),
      (col("id") % 3600).cast("double").as("retentionTime"),
      transform(peaks, p => p.cast("double") * 10.0).as("masses"),
      transform(peaks, p => p.cast("double")).as("intensities"),
    ).withColumn("fileType", lit("MGF"))

    val cfg = IndexPipeline.IndexConfig(
      projectAccession = "PXDBENCH", assayAccession = "bench",
      qValueThreshold = 0.05, minPsms = 1)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val t0 = System.nanoTime()
    // Stage attribution: `build` runs the eager pre-count + plan
    // construction; the first sink drive pays the shared FDR + join +
    // projection DAG (cached at perPsm), the later drives reuse it.
    val (out, tBuild) = time(IndexPipeline.run(psms, spectra, None, cfg))
    val (_, tSpectra) = time(
      out.archiveSpectra.write.format("noop").mode("overwrite").save())
    val (_, tSummaries) = time(
      out.psmSummaries.write.format("noop").mode("overwrite").save())
    val (_, tProteins) = time(
      out.proteinEvidence.write.format("noop").mode("overwrite").save())
    val (v, tValidity) = time(out.validity.head())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"assay_index_sec","value":$sec%.1f,"unit":"sec","n_psms":$nPsms,"cpus":$cpus,"out_psms":${v.getAs[Long]("nr_psms")},"nr_decoys":${v.getAs[Long]("nr_decoys")},"stages":{"build_precount":$tBuild%.1f,"archive_spectra":$tSpectra%.1f,"psm_summaries":$tSummaries%.1f,"protein_evidence":$tProteins%.1f,"validity":$tValidity%.1f}}""")
    spark.stop()
  }
}
