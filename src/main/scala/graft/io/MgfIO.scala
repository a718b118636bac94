package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MGF spectra source/sink (SURVEY.md §2.1 S2, K3).
  *
  * The reference does random access by spectrum index through jmzReader
  * (JmzReaderSpectrumService.java:120-128); Spark-first, the whole file
  * becomes a `DataFrame` of spectra with an explicit 0-based per-file
  * `index` column, and the reference's point lookups become joins (J1).
  *
  * Reading is splittable: `lineSep = "END IONS"` chunks the file at block
  * boundaries, so a 100 GB MGF parallelizes across tasks; the per-file
  * index is recovered with a window over `monotonically_increasing_id()`
  * (file splits are enumerated in offset order by the text source, so the
  * id is monotone within a file).
  */
object MgfIO {

  /** Parse MGF files under `path` into spectra rows:
    * (fileName, index, scanId, title, msLevel=2, precursorMz,
    * precursorCharge, retentionTime, masses, intensities). */
  def read(spark: SparkSession, path: String): DataFrame = readPaths(spark, Seq(path))

  def readPaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val raw = spark.read.option("lineSep", "END IONS").text(paths: _*)
      .withColumn("fileName", regexp_replace(input_file_name(), ".*/", ""))
      .withColumn("_mid", monotonically_increasing_id())
      // CRLF robustness: strip \r once so line parsing sees clean \n blocks.
      .withColumn("value", regexp_replace(col("value"), "\r", ""))
      .filter(col("value").contains("BEGIN IONS"))

    val lines = split(col("value"), "\n")
    def headerVal(key: String): Column = {
      val hits = filter(lines, l => l.startsWith(s"$key="))
      when(size(hits) > 0, regexp_replace(element_at(hits, 1), s"^$key=", ""))
    }

    val peakLines = filter(lines, l => l.rlike("^\\s*[0-9][0-9.eE+-]*[ \\t]+[0-9]"))
    val chargeRaw = headerVal("CHARGE")
    val w = Window.partitionBy(col("fileName")).orderBy(col("_mid"))

    raw
      .withColumn("index", row_number().over(w).cast("long") - 1)
      .select(
        col("fileName"),
        col("index"),
        col("index").cast("string").as("scanId"),
        coalesce(headerVal("TITLE"), lit("")).as("title"),
        lit(2).as("msLevel"),
        regexp_extract(headerVal("PEPMASS"), "^([0-9.eE+-]+)", 1).cast("double")
          .as("precursorMz"),
        // "2+", "2.0+", "3-" -> signed int
        (regexp_extract(chargeRaw, "^([0-9.]+)", 1).cast("double") *
          when(chargeRaw.endsWith("-"), -1).otherwise(1)).cast("int")
          .as("precursorCharge"),
        headerVal("RTINSECONDS").cast("double").as("retentionTime"),
        // Columns 1 and 2 of the peak line, like [[parseBlocks]] — an
        // end-anchored intensity regex would grab the CHARGE column of a
        // 3-column "m/z intensity charge" peak line instead of column 2.
        transform(peakLines, l =>
          element_at(split(trim(l), "[ \\t]+"), 1).cast("double")).as("masses"),
        transform(peakLines, l =>
          element_at(split(trim(l), "[ \\t]+"), 2).cast("double"))
          .as("intensities"),
      )
  }

  /** Scala-side MGF block parser (shared by [[readExact]]); semantics
    * mirror the column-expression parser in [[readPaths]]. */
  private[io] def parseBlocks(fileName: String, content: String): Seq[(
      String, Long, String, String, Int, Option[Double], Option[Int], Option[Double],
      Seq[Double], Seq[Double])] = {
    val blocks = content.replace("\r", "").split("END IONS")
      .filter(_.contains("BEGIN IONS"))
    blocks.zipWithIndex.map { case (block, idx) =>
      val lines = block.split("\n")
      def header(key: String): Option[String] =
        lines.find(_.startsWith(s"$key=")).map(_.substring(key.length + 1))
      val peakLines = lines.filter(_.matches("^\\s*[0-9][0-9.eE+-]*[ \\t]+[0-9].*"))
      val peaks = peakLines.map { l =>
        val parts = l.trim.split("[ \\t]+")
        (parts(0).toDouble, parts(1).toDouble)
      }
      // Missing/malformed headers become nulls — identical to the
      // column-expression parser (readPaths), so the F12 validity gate
      // sees the same rows either way.
      val charge = header("CHARGE").flatMap { c =>
        val mag = c.takeWhile(ch => ch.isDigit || ch == '.')
        val sign = if (c.endsWith("-")) -1 else 1
        mag.toDoubleOption.map(m => (m * sign).toInt)
      }
      (fileName, idx.toLong, idx.toString, header("TITLE").getOrElse(""), 2,
        header("PEPMASS").flatMap(_.split("\\s+").headOption).flatMap(_.toDoubleOption),
        charge,
        header("RTINSECONDS").flatMap(_.toDoubleOption),
        peaks.map(_._1).toSeq, peaks.map(_._2).toSeq)
    }.toSeq
  }

  /** Exact-index variant: parses each file WHOLE in one task
    * (`wholeTextFiles`), so the 0-based per-file index is guaranteed by
    * construction rather than by split ordering. Use for the positional
    * cluster contract (J4) and small-to-medium files; the splittable
    * [[read]] is the path for huge single files. */
  def readExact(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .wholeTextFiles(path)
      .flatMap { case (file, content) =>
        parseBlocks(file.replaceAll(".*/", ""), content)
      }
      .toDF("fileName", "index", "scanId", "title", "msLevel", "precursorMz",
        "precursorCharge", "retentionTime", "masses", "intensities")
  }

  /** K3 — format spectra as MGF blocks, byte-compatible with the reference
    * writer (MGFPRIDEWriter.java:12-62): `TITLE=id=<usi>[,sequence=<pf>]`,
    * PEPMASS/CHARGE as Java double strings (charge suffixed `+` when
    * positive), peaks as `%10.3f "\t" %10.3f`-trimmed.
    *
    * Expects columns (usi, peptidoform, precursorMz, precursorCharge,
    * masses, intensities). Returns a single-column DataFrame of blocks in
    * the given order — the MGF row order IS the MaraCluster positional
    * contract (J4), so callers must pass an explicit `orderBy`. */
  def toMgfBlocks(df: DataFrame, orderBy: Seq[Column]): DataFrame = {
    // A null usi/precursorMz/precursorCharge would null the whole concat
    // and the text writer would emit an EMPTY line — silently shifting
    // every later spectrum index against the (usi, index) sidecar, i.e.
    // corrupting the MaraCluster positional contract. Fail loudly instead
    // (coalesce short-circuits, so the error fires only on an actual null).
    def reqNonNull(c: Column, what: String): Column =
      coalesce(c, raise_error(lit(
        s"toMgfBlocks: null $what would emit an empty MGF block and shift " +
          "the positional index")))
    val charge = reqNonNull(col("precursorCharge").cast("double"), "precursorCharge")
    val block = concat(
      lit("BEGIN IONS\n"),
      lit("TITLE=id="), reqNonNull(col("usi"), "usi"),
      when(col("peptidoform").isNotNull && length(col("peptidoform")) > 0,
        concat(lit(",sequence="), col("peptidoform"))).otherwise(lit("")),
      lit("\n"),
      lit("PEPMASS="), charge_str(reqNonNull(col("precursorMz"), "precursorMz")), lit("\n"),
      lit("CHARGE="), charge_str(charge),
      when(charge > 0, lit("+")).otherwise(lit("")), lit("\n"),
      when(size(col("masses")) > 0,
        concat(array_join(zip_with(col("masses"), col("intensities"),
          (m, i) => concat(format_string("%10.3f", m), lit("\t"),
            trim(format_string("%10.3f", i)))), "\n"), lit("\n")))
        .otherwise(lit("")),
      lit("END IONS"),
    )
    df.orderBy(orderBy: _*).select(block.as("value"))
  }

  /** Java `String.valueOf(double)` shape: integral doubles render "2.0". */
  private def charge_str(c: Column): Column =
    when(c === c.cast("long").cast("double"),
      concat(c.cast("long").cast("string"), lit(".0")))
      .otherwise(c.cast("string"))

  /** Write MGF to a single text file directory (one file per assay keeps the
    * MaraCluster index contract; per-assay parallelism is across assays). */
  def write(df: DataFrame, orderBy: Seq[Column], path: String): Unit =
    toMgfBlocks(df, orderBy).coalesce(1).write.mode("overwrite").text(path)
}
