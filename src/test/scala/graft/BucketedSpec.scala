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

  test("reuseExisting skips the rewrite for an identical call and rebuilds on changed input") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketed.coLocatedJoin(spark, df, df, "k", 2, "graft_bkt_reuse").count()
    def createdAt: Long = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_bkt_reuse_l"))
      .createTime
    val t0 = createdAt
    // identical call + reuse on: served from the catalog, no rewrite
    val reused = Bucketed.coLocatedJoin(spark, df, df, "k", 2,
      "graft_bkt_reuse", reuseExisting = true)
    assert(reused.count() == 2L)
    assert(createdAt == t0, "identical reuse call must not rewrite the tables")
    // r7-advice hazard: a DIFFERENT non-file input (distinct local
    // relation) must NOT be served the first build's data — the plan-aware
    // fingerprint mismatches and forces a rebuild
    val other = Seq((9L, "z")).toDF("k", "v")
    val rebuilt = Bucketed.coLocatedJoin(spark, other, other, "k", 2,
      "graft_bkt_reuse", reuseExisting = true)
    assert(rebuilt.count() == 1L)
  }

  test("reuseExisting rebuilds when the transformation over the same files changes") {
    // r7-advice hazard: same input FILES, different filter/projection —
    // a file-list-only fingerprint would serve the unfiltered build
    val dir = java.nio.file.Files.createTempDirectory("bkt_fp_plan").toString
    (1L to 6L).map(i => (i, "x")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val first = Bucketed.coLocatedJoin(spark, full, full, "k", 2,
      "graft_bkt_plan", reuseExisting = true)
    assert(first.count() == 6L)
    val filtered = full.filter(col("k") <= 2L)
    val second = Bucketed.coLocatedJoin(spark, filtered, filtered, "k", 2,
      "graft_bkt_plan", reuseExisting = true)
    assert(second.count() == 2L,
      "a differently-filtered frame over the same files must rebuild, not reuse")
    // unchanged (files, plan, spec): served from the catalog
    val third = Bucketed.coLocatedJoin(spark, filtered, filtered, "k", 2,
      "graft_bkt_plan", reuseExisting = true)
    assert(third.count() == 2L)
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
