package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PRIDE REST metadata scans (SURVEY.md §2.1 S3, S4).
  *
  * Driver-side HTTP producing small broadcastable DataFrames. The fetcher
  * is injectable so tests replay recorded JSON fixtures (FIXTURES.md §3.3)
  * with no network; the default fetcher retries 5 times with a 10 s sleep,
  * mirroring PrideArchiveWebService.java:36,:63-66.
  */
class PrideRest(
    baseUrl: String = "https://www.ebi.ac.uk/pride/ws/archive/v2",
    fetch: String => String = PrideRest.httpFetch(5, 10000),
) {

  /** S3 — one-row project DataFrame for an accession
    * (PrideArchiveWebService.findByAccession:44-71). */
  def project(spark: SparkSession, accession: String): DataFrame =
    jsonToDf(spark, fetch(s"$baseUrl/projects/$accession"))

  /** S4 — project files, dropping the generated `pride.mztab`/`pride.mgf`
    * artifacts (PrideArchiveWebService.findFilesByProjectAccession:73-91). */
  def files(spark: SparkSession, accession: String): DataFrame =
    jsonToDf(spark, fetch(s"$baseUrl/files/byProject?accession=$accession"))
      .filter(!lower(col("fileName")).contains("pride.mztab") &&
        !lower(col("fileName")).contains("pride.mgf"))

  /** RESULT-category files only, excluding category PRIDE:1002848 (F1,
    * PrideArchiveWebService.java:117-118; PrideAnalysisAssayService.java:128). */
  def resultFiles(spark: SparkSession, accession: String): DataFrame =
    files(spark, accession).filter(PrideRest.isResultFile)

  private def jsonToDf(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(body).toDS())
  }
}

object PrideRest {

  /** F1 gate as a shared predicate, so callers (and the demo oracle
    * query) can never drift from [[PrideRest.resultFiles]]. */
  val isResultFile: org.apache.spark.sql.Column =
    col("fileCategory.value") === "RESULT" &&
      col("fileCategory.accession") =!= "PRIDE:1002848"

  /** Plain `java.net.http` GET with retry/backoff — a driver-side utility,
    * deliberately not a Spark concern (SURVEY §4). */
  def httpFetch(retries: Int, sleepMs: Long)(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    var attempt = 0
    var last: Throwable = null
    while (attempt < retries) {
      try {
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) return resp.body()
        last = new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      } catch { case t: Throwable => last = t }
      attempt += 1
      if (attempt < retries) Thread.sleep(sleepMs)
    }
    throw new RuntimeException(s"Failed after $retries attempts: $url", last)
  }

  /** K4 — result-file TSV sink: (name, date, accession, ftp), tab-separated
    * with header (PrideArchiveWebService.java:113-126). */
  def writeResultFilesTsv(files: DataFrame, path: String): Unit =
    files
      .select(col("fileName").as("name"),
        date_format(col("publicationDate"), "yyyy-MM-dd").as("date"),
        col("accession"),
        col("ftp"))
      .write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)
}
