package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Side-input scans: MaraCluster TSV (S6) and SDRF sample metadata (S7). */
object SideInputs {

  val maraClusterSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("spectrumIndex", LongType),
    StructField("clusterId", LongType),
  ))

  /** S6 — MaraCluster result scan: 3-col headerless TSV (file,
    * spectrumIndex, clusterId), blank lines allowed, duplicate spectrum
    * index is a hard error.
    * Reference: PSMClusteringService.readMaraClusterResults:64-89. */
  def readMaraCluster(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(maraClusterSchema)
      .option("sep", "\t")
      .csv(path)
      .filter(col("file").isNotNull)

  /** Duplicate-index guard (the reference throws on duplicates,
    * PSMClusteringService.java:81-84). Costs one action. */
  def assertUniqueSpectrumIndex(clusters: DataFrame): Unit = {
    val dup = clusters.groupBy(col("spectrumIndex")).count().filter(col("count") > 1)
    val first = dup.take(1)
    if (first.nonEmpty)
      throw new IllegalStateException(
        s"Duplicate spectrum index in cluster file: ${first(0).get(0)}")
  }

  /** Characteristic-name -> EFO accession lookup. The reference resolves
    * names against the full EFO ontology OBO at runtime
    * (PrideAnalysisAssayService.java:99 `getEFOOboMapper`, :341-347
    * `getTermByName`); this environment is offline, so a bundled table of
    * the standard SDRF-Proteomics characteristics (public EFO ids) stands
    * in, and callers can pass a fuller mapping. Unknown names carry a null
    * accession exactly like the reference's unresolved-term case. */
  val DefaultEfoTerms: Map[String, String] = Map(
    "organism" -> "EFO:0000634",
    "organism part" -> "EFO:0000635",
    "disease" -> "EFO:0000408",
    "cell type" -> "EFO:0000324",
    "cell line" -> "EFO:0000322",
    "developmental stage" -> "EFO:0000399",
    "age" -> "EFO:0000246",
    "sex" -> "PATO:0000047",
    "strain" -> "EFO:0005135",
    "phenotype" -> "EFO:0000651",
  )

  /** S7 — SDRF scan: TSV with header; melts every `characteristics[x]`
    * column into (fileKey, accession, name, value) rows, where fileKey is
    * the `comment[data file]` basename without extension. The EFO
    * accession is resolved at PLAN time (column names are static), so the
    * lookup costs nothing per row.
    * Reference: PrideAnalysisAssayService.initGlobalSampleMetadata:314-357. */
  def readSdrf(
      spark: SparkSession,
      path: String,
      efoTerms: Map[String, String] = DefaultEfoTerms,
  ): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val charCols = raw.columns.filter(_.toLowerCase.startsWith("characteristics["))
    val fileCol = raw.columns
      .find(_.equalsIgnoreCase("comment[data file]"))
      .getOrElse(throw new IllegalArgumentException("SDRF lacks comment[data file]"))

    val entries = array(charCols.map { c =>
      val name = c.substring(c.indexOf('[') + 1, c.lastIndexOf(']'))
      val accession = efoTerms.get(name.toLowerCase)
        .map(lit).getOrElse(lit(null).cast("string"))
      struct(accession.as("accession"), lit(name).as("name"), col(s"`$c`").as("value"))
    }.toIndexedSeq: _*)

    raw.select(
      regexp_replace(col(s"`$fileCol`"), "\\.[^.]*$", "").as("fileKey"),
      explode(entries).as("e"),
    ).select(col("fileKey"), col("e.accession").as("accession"),
      col("e.name").as("name"), col("e.value").as("value"))
  }
}
