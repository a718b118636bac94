package graft.pipeline

import graft.functions.UsiFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectra-file relation joins (SURVEY.md §2.3 J2, J3).
  *
  * The reference resolves which provided/archive files back each
  * SpectraData declaration with nested loops; both become joins over small
  * broadcast dimension tables.
  */
object FileRelations {

  /** J2 — match declared SpectraData locations to user-provided file paths
    * by case-insensitive basename after decompress-normalization; a
    * declaration with no provided file is a hard error (anti-join guard).
    * Reference: PrideAnalysisAssayService.getRelatedFiles:867-896.
    *
    * @param declared (spectraDataId, location)
    * @param provided (path)
    * @return (spectraDataId, location, path)
    */
  def relateProvidedFiles(declared: DataFrame, provided: DataFrame): DataFrame = {
    val d = declared.withColumn("key",
      lower(UsiFunctions.fileNameNoExtension(col("location"))))
    val p = provided.withColumn("key",
      lower(UsiFunctions.fileNameNoExtension(col("path"))))

    val unmatched = d.join(p, Seq("key"), "left_anti").select(col("location")).take(3)
    if (unmatched.nonEmpty)
      throw new IllegalStateException(
        "Declared spectra files without a provided file: " +
          unmatched.map(_.getString(0)).mkString(", "))

    d.join(broadcast(p), Seq("key"))
      .select(col("spectraDataId"), col("location"), col("path"))
  }

  /** J3 — theta-join of PRIDE web-service project files to SpectraData by
    * `contains(lower(fileName), lower(basename(location)))`; small dims, so
    * a broadcast nested-loop is the right physical plan.
    * Reference: getFilesRelatedToResultFile (PrideAnalysisAssayService.java:906-924),
    * combineSpectraControllers (SubmissionPipelineUtils.java:188-204).
    *
    * @param projectFiles (fileName, ...) from the web service
    * @param spectraData  (spectraDataId, location)
    */
  def relateProjectFiles(projectFiles: DataFrame, spectraData: DataFrame): DataFrame = {
    val sd = broadcast(spectraData.withColumn("base",
      lower(element_at(split(col("location"), "/"), -1))))
    projectFiles
      .join(sd, lower(col("fileName")).contains(col("base")))
      .select(col("spectraDataId"), col("location"), col("fileName"))
  }
}
