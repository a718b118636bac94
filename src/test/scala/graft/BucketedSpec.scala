package graft

import graft.operators.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-located join plan has no exchange; values match a plain join") {
    val left = (1L to 400L).map(i => (i % 50, i)).toDF("k", "lv")
    val right = (1L to 300L).map(i => (i % 50, i * 10)).toDF("k", "rv")
    // Broadcast would be the right plan for a table THIS small — disable
    // it so the plan shows the big-to-big shape bucketing exists for.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.coLocatedJoin(spark, left, right, "k", nBuckets = 4,
        tablePrefix = "graft_bkt_spec")

      // the whole point: both scans are pre-partitioned by bucket metadata,
      // so the SMJ needs no Exchange on either side
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("SelectedBucketsCount") || plan.toLowerCase.contains("bucketed: true"),
        plan)

      // correctness: identical multiset of joined rows as the shuffled join
      val expected = left.join(right, "k")
        .select(col("k"), col("lv"), col("rv")).collect().map(_.toSeq).sortBy(_.toString)
      val got = joined
        .select(col("k"), col("lv"), col("rv")).collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == expected.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("rewrite is idempotent: overwrite mode allows repeated runs") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val first = Bucketed.coLocatedJoin(spark, df, df, "k", 2, "graft_bkt_rerun").count()
    val second = Bucketed.coLocatedJoin(spark, df, df, "k", 2, "graft_bkt_rerun").count()
    assert(first == 2L && second == 2L)
  }

  test("reuseExisting skips the rewrite and serves the cataloged tables") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketed.coLocatedJoin(spark, df, df, "k", 2, "graft_bkt_reuse").count()
    // second call with DIFFERENT input but reuse on: the cataloged
    // (first-build) tables win, proving the write was skipped
    val other = Seq((9L, "z")).toDF("k", "v")
    val reused = Bucketed.coLocatedJoin(spark, other, other, "k", 2,
      "graft_bkt_reuse", reuseExisting = true)
    assert(reused.count() == 2L)
    // without reuse the same call rebuilds from the new input
    val rebuilt = Bucketed.coLocatedJoin(spark, other, other, "k", 2,
      "graft_bkt_reuse")
    assert(rebuilt.count() == 1L)
  }

  test("reuseExisting rebuilds when file-backed inputs change (fingerprint mismatch)") {
    // the r6-advice hazard: one tablePrefix, two data dirs in one session —
    // reuse must NOT serve the first dir's data for the second
    val dirA = java.nio.file.Files.createTempDirectory("bkt_fp_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("bkt_fp_b").toString
    (1L to 4L).map(i => (i, "a")).toDF("k", "v").write.mode("overwrite").parquet(dirA)
    (1L to 7L).map(i => (i, "b")).toDF("k", "v").write.mode("overwrite").parquet(dirB)
    val a = spark.read.parquet(dirA)
    val b = spark.read.parquet(dirB)
    val first = Bucketed.coLocatedJoin(spark, a, a, "k", 2,
      "graft_bkt_fp", reuseExisting = true)
    assert(first.count() == 4L)
    // same prefix + reuse on, different input files: fingerprint mismatch
    // forces a rebuild from dirB instead of silently serving dirA
    val second = Bucketed.coLocatedJoin(spark, b, b, "k", 2,
      "graft_bkt_fp", reuseExisting = true)
    assert(second.count() == 7L)
    // unchanged inputs + reuse: served from the catalog (fingerprint match)
    val third = Bucketed.coLocatedJoin(spark, b, b, "k", 2,
      "graft_bkt_fp", reuseExisting = true)
    assert(third.count() == 7L)
  }
}
