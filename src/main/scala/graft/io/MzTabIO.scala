package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** mzTab identification source (SURVEY.md §2.1 S1, FIXTURES.md §1.1).
  *
  * mzTab is line-typed TSV: `MTD` metadata lines, one `PSH` header line,
  * and `PSM` data lines. The reference parses it through the PIA library
  * (PIAModelerService.java:162-189); here the PSM section is read as a
  * filtered text scan + split projection — fully distributed, no
  * serialize/deserialize hop through /tmp.
  *
  * The PSH header (one line) is collected to the driver to derive the
  * column mapping; PSM rows never leave executors.
  */
object MzTabIO {

  /** Raw PSM section as string columns named by the (sanitized) PSH header. */
  def readPsmSection(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val headerRow = lines.filter(col("value").startsWith("PSH\t")).head()
    val header = headerRow.getString(0).split("\t").drop(1).map(sanitize)

    val cols = split(col("value"), "\t")
    val projected = header.zipWithIndex.map { case (name, i) =>
      // try_element_at: a PSM row with fewer fields than the PSH header
      // (writers legally omit trailing optional columns) yields nulls for
      // the missing columns instead of an ANSI INVALID_ARRAY_INDEX crash
      try_element_at(cols, lit(i + 2)).as(name) // +2: 1-based, skip "PSM" tag
    }
    lines.filter(col("value").startsWith("PSM\t")).select(projected.toIndexedSeq: _*)
  }

  private def sanitize(name: String): String =
    name.trim.toLowerCase
      .replaceAll("\\[(\\d+)\\]", "_$1")
      .replaceAll("[^a-z0-9_]+", "_")
      .replaceAll("_+", "_").stripSuffix("_")

  /** ms_run locations from the MTD section: (msRun, location). */
  def readMsRuns(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").rlike("^MTD\\tms_run\\[\\d+\\]-location\\t"))
      .select(
        regexp_extract(col("value"), "ms_run\\[(\\d+)\\]", 1).cast("int").as("msRun"),
        regexp_extract(col("value"), "\\t([^\\t]+)$", 1).as("location"),
      )

  /** mzTab `modifications` parser — an input-boundary UDF (the format
    * allows bracketed CV terms containing commas, multi-position entries
    * like `3|5-UNIMOD:35`, and duplicate positions; a tolerant imperative
    * parse beats a fragile split chain here). Last-wins on duplicate
    * positions, mirroring Jackson/HashMap behavior in the reference. */
  private[graft] def parseModifications(s: String): Map[Int, String] =
    if (s == null || s.isEmpty || s == "null" || s == "0") Map.empty
    else {
      // split on commas that are outside square brackets
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      s.foreach {
        case '[' => depth += 1; cur.append('[')
        case ']' => depth -= 1; cur.append(']')
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      parts += cur.toString
      // position/accession separator: the first '-' OUTSIDE brackets — a
      // bare indexOf would match a '-' inside a bracketed CV term (e.g. a
      // negative probability in `3[MS, MS:1001876, prob, -0.27]-UNIMOD:35`)
      def dashAtDepth0(p: String): Int = {
        var d = 0
        var i = 0
        while (i < p.length) {
          p.charAt(i) match {
            case '[' => d += 1
            case ']' => d -= 1
            case '-' if d == 0 => return i
            case _ =>
          }
          i += 1
        }
        -1
      }
      parts.iterator.flatMap { p =>
        val dash = dashAtDepth0(p)
        if (dash <= 0) None
        else {
          val posPart = p.substring(0, dash)
          val acc = p.substring(dash + 1)
          // first integer of a possibly multi-position `3|5` prefix
          val first = posPart.split('|').headOption.map(_.trim.takeWhile(_.isDigit))
          first.filter(_.nonEmpty).map(d => d.toInt -> acc)
        }
      }.toMap
    }

  private val parseModsUdf = udf(parseModifications _)

  // ANSI-safe numeric cast: mzTab uses the literal "null" for missing
  // values, and Spark 4 ANSI casts throw on malformed strings.
  private def numOrNull(c: Column): Column =
    when(c.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"), c.cast("double"))

  /** Standardized PSM frame with typed columns matching [[graft.model.Psm]]:
    * psmId, peptideSequence, proteinAccession, isDecoy, score, charge,
    * expMassToCharge, calcMassToCharge, modifications (Map[pos, accession]),
    * sourceId (after the `ms_run[n]:` prefix), msRun, retentionTime.
    *
    * Decoy flag: `opt_global_cv_MS:1002217_decoy_peptide` column when
    * present, else accession prefix match (the reference's "searchengine"
    * decoy pattern, PIAModelerService.java:66). */
  def standardPsms(raw: DataFrame, decoyPrefix: String = "DECOY_"): DataFrame = {
    val has = raw.columns.toSet
    def opt(name: String) = if (has(name)) col(name) else lit(null).cast("string")

    val decoyCol =
      if (has("opt_global_cv_ms_1002217_decoy_peptide"))
        col("opt_global_cv_ms_1002217_decoy_peptide") === "1"
      else col("accession").startsWith(decoyPrefix)

    raw.select(
      col("psm_id").as("psmId"),
      col("sequence").as("peptideSequence"),
      col("accession").as("proteinAccession"),
      decoyCol.as("isDecoy"),
      numOrNull(col("search_engine_score_1")).as("score"),
      numOrNull(col("charge")).cast("int").as("charge"),
      numOrNull(col("exp_mass_to_charge")).as("expMassToCharge"),
      numOrNull(col("calc_mass_to_charge")).as("calcMassToCharge"),
      parseModsUdf(opt("modifications")).as("modifications"),
      regexp_extract(col("spectra_ref"), "^ms_run\\[\\d+\\]:(.*)$", 1).as("sourceId"),
      when(col("spectra_ref").rlike("^ms_run\\[\\d+\\]"),
        regexp_extract(col("spectra_ref"), "^ms_run\\[(\\d+)\\]", 1).cast("int"))
        .as("msRun"),
      numOrNull(opt("retention_time")).as("retentionTime"),
    )
  }
}
