package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Measurement probe (round-14 optimization): phase-level timing of the
  * StreamHarness lifecycle — query start, per-step fence, stop/collect —
  * so streaming-query bench cost is attributable to phases instead of
  * guessed. Not part of the driver contract. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val trig = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIGGER", "50 milliseconds")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(label: String): Unit = {
      val batchLines = QueriesEventsQuality.lateDataBatches
      val base = sys.env.get("SPARK_GRAFT_STREAM_TMP")
        .map(java.nio.file.Paths.get(_)).getOrElse(
          java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      val root = java.nio.file.Files.createTempDirectory(base, "graft-stream-probe")
      val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
      val ckpt = root.resolve("ckpt").toString
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "2"))
      graft.functions.GraftFunctions.ensureRegistered(ss)
      val t0 = System.nanoTime()
      def mark(s: String) = println(f"PROBE $label $s=${(System.nanoTime() - t0) / 1e9}%.3f")
      val src = ss.readStream.schema(graft.streaming.EventStream.eventSchema).json(inDir.toString)
      val q = graft.streaming.EventStream.windowedCounts(src, "1 hour")
        .writeStream.format("memory").queryName(s"probe_$label")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(trig))
        .start()
      mark("started")
      batchLines.zipWithIndex.foreach { case (lines, i) =>
        val f = inDir.resolve(f"batch$i%03d.json")
        java.nio.file.Files.writeString(f, lines.mkString("\n"))
        q.processAllAvailable()
        mark(s"step$i")
      }
      q.recentProgress.foreach { p =>
        println(s"PROGRESS $label batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}")
      }
      q.stop(); q.awaitTermination()
      mark("stopped")
      val n = ss.table(s"probe_$label").collect().length
      mark(s"collected_n$n")
      ss.catalog.dropTempView(s"probe_$label")
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
        f.delete(); ()
      }
      wipe(root.toFile)
    }
    once("cold")
    once("warm1")
    once("warm2")
    spark.stop()
  }
}
