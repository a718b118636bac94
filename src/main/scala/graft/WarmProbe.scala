package graft
import org.apache.spark.sql.SparkSession
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.pipeline.DemoAssay._
    t("runIndex")(runIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    t("filterGateIndex")(filterGateIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    t("combinedFdrProteinIndex")(combinedFdrProteinIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    t("pickedFdrIndex")(pickedFdrIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    t("multiFileIndex")(multiFileIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    t("prideXmlIndex")(prideXmlIndex(spark).archiveSpectra.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
