package graft

import java.nio.file.Files

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-pattern verification: salting equivalence and bucketed co-located
  * joins (SURVEY §4 / README "Design for 100 TB"). */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAggregate equals plain aggregate on skewed keys") {
    // hot key: 10k rows on one key, few on others
    val df = ((1 to 10000).map(i => ("hot", i.toLong, 1.0)) ++
      (1 to 5).map(i => (s"cold$i", i.toLong + 100000, 2.0)))
      .toDF("k", "id", "v")
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedAggregate(
      df, $"k", $"id", saltBuckets = 8,
      partials = Seq(count(lit(1)).as("pn"), sum($"v").as("ps")),
      finals = Seq(sum($"pn").as("n"), sum($"ps").as("s")))
      .withColumnRenamed("_key", "k")
      .orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(plain.toSeq == salted.toSeq)
  }

  test("saltedJoin equals plain join with a skewed probe side") {
    val probe = ((1 to 5000).map(i => (1L, i.toLong)) ++ Seq((2L, 9001L), (3L, 9002L)))
      .toDF("k", "id")
    val build = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name")
    val plain = probe.join(build, "k").groupBy($"name").count()
      .orderBy($"name").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedJoin(probe, build, "k", $"id", saltBuckets = 4)
      .groupBy($"name").count()
      .orderBy($"name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(plain.toSeq == salted.toSeq)
  }

  test("fanoutGuardedJoin: passes on a unique dim, raises on the explosion") {
    val left = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val ok = Skew.fanoutGuardedJoin(left, dim, "k", maxMatches = 1)
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ok.toSeq == Seq((1L, "x", "a"), (2L, "y", "b")))
    assert(!ok.map(_._1).contains(3L), "inner join: unmatched left drops")
    // duplicate dim key over the cap -> loud runtime failure naming it
    val dup = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("k", "name")
    val e = intercept[Exception] {
      Skew.fanoutGuardedJoin(left, dup, "k", maxMatches = 1).collect()
    }
    assert(e.getMessage.contains("fanoutGuardedJoin") || Option(e.getCause)
      .exists(_.getMessage.contains("fanoutGuardedJoin")), e.toString)
    // a cap of 2 tolerates it
    assert(Skew.fanoutGuardedJoin(left, dup, "k", maxMatches = 2).count() == 3L)
  }

  test("scan-parallelism guard keeps filters and pruning pushed below its exchange") {
    val s = TestSpark.spark
    val df = Tables(s, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") >= 5)
      .select(col("l_orderkey"), col("l_quantity"))
    // sparkPlan: AQE wraps executedPlan in AdaptiveSparkPlanExec, which
    // hides its children from collect until execution
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    // filter reached the parquet scan...
    assert(scan.get.metadata("PushedFilters").contains("GreaterThanOrEqual(l_quantity"),
      scan.get.metadata("PushedFilters"))
    // ...and the read schema is pruned to the two projected columns
    assert(scan.get.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"))
  }

  test("global index is invariant to input partitioning") {
    val s = TestSpark.spark
    import s.implicits._
    val base = (0L until 5000L).map(i => (i, s"v$i")).toDF("k", "v")
    def idx(df: org.apache.spark.sql.DataFrame) =
      graft.operators.GlobalIndex.withGlobalIndex(df, Seq(col("k").desc), "gidx")
        .select(col("k"), col("gidx"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = idx(base.repartition(32))
    val b = idx(base.coalesce(1))
    val c = idx(base.repartition(7, col("v")))
    assert(a == b && b == c)
    assert(a(4999L) == 0L && a(0L) == 4999L) // desc order contract
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = TestSpark.spark // default warehouse dir (static conf); tables dropped below
    val li = Tables(s, "/root/testdata/sf0.001", "lineitem")
    val o = Tables(s, "/root/testdata/sf0.001", "orders")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // disable broadcast so only bucketing can avoid the exchange
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
