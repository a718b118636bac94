package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md sections: prints `## <query>` + the physical plan
  * (`queryExecution.executedPlan`, lines truncated for readability) for a
  * comma-separated list of SparkEntry queries.
  *
  * Usage: runMain graft.PlanDump <sfDir> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
        .linesIterator
        .map(l => if (l.length > 160) l.take(157) + "..." else l)
        .mkString("\n")
      println(s"## $name\n\n```\n$plan```\n")
    }
    graft.pipeline.DemoAssay.releaseIndex(spark)
    spark.stop()
  }
}
