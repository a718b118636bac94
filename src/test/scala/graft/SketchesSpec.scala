package graft

import graft.functions.TextFunctions
import graft.operators.{Sketches, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmv below k is the exact distinct count, duplicates ignored") {
    val df = (1 to 500).map(i => i % 7).toDF("v") // 7 distinct values
    val row = Sketches.kmvDistinct(df, "v", col("v"), k = 64).collect().head
    assert(row.getAs[Long]("n_kmv") == 7L)
    assert(row.getAs[Double]("estimate") == 7.0)
  }

  test("kmv estimate lands near the true cardinality and is partitioning-invariant") {
    val df = (1 to 5000).toDF("v")
    val est = Sketches.kmvDistinct(df, "v", col("v"), k = 128).collect().head
      .getAs[Double]("estimate")
    // KMV relative error ~ 1/sqrt(k-1) ≈ 9%; allow 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.27, s"estimate $est")
    for (n <- Seq(1, 3, 13)) {
      val est2 = Sketches.kmvDistinct(df.repartition(n), "v", col("v"), k = 128)
        .collect().head.getAs[Double]("estimate")
      assert(est2 == est, s"estimate varies with partitioning at n=$n")
    }
  }

  test("kmv min-hash set equals the brute-force k smallest distinct hashes") {
    val df = (1 to 300).map(i => s"doc-$i").toDF("v")
    val got = Sketches.kmvMinHashes(df, col("v"), k = 16)
      .as[Long].collect().toSeq
    val want = df.select(TextFunctions.portableHash32(col("v").cast("string")).as("h"))
      .distinct().orderBy("h").limit(16).as[Long].collect().toSeq
    assert(got == want)
  }

  test("kmv of an empty input reports zero") {
    val row = Sketches.kmvDistinct(Seq.empty[Int].toDF("v"), "v", col("v"), k = 8)
      .collect().head
    assert(row.getAs[Long]("n_kmv") == 0L && row.getAs[Double]("estimate") == 0.0)
  }

  test("grouped kmv agg matches the per-group brute-force k-min sketch") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val got = Sketches.kmvDistinctByGroup(df, Seq(col("g")), col("v"), 16)
      .orderBy("g").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("n_kmv"),
        r.getAs[Long]("kth_hash"), r.getAs[Double]("estimate"))).toSeq
    // brute force per group via the relation-level sketch on a filtered df
    (0 to 2).foreach { gi =>
      val sub = df.filter(col("g") === s"g$gi").select(col("v"))
      val bf = Sketches.kmvDistinct(sub, "v", col("v"), 16).collect().head
      val row = got.find(_._1 == s"g$gi").get
      assert(row._2 == bf.getAs[Long]("n_kmv"))
      assert(row._3 == bf.getAs[Long]("kth_hash"))
      assert(row._4 == bf.getAs[Double]("estimate"))
    }
    // partitioning invariance of the merge path
    val got2 = Sketches.kmvDistinctByGroup(df.repartition(13), Seq(col("g")), col("v"), 16)
      .orderBy("g").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("n_kmv"),
        r.getAs[Long]("kth_hash"), r.getAs[Double]("estimate"))).toSeq
    assert(got2 == got)
  }

  test("grouped kmv: nulls ignored, all-null group reports an empty sketch") {
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", None), ("b", None))
      .toDF("g", "v")
    val got = Sketches.kmvDistinctByGroup(df, Seq(col("g")), col("v"), 8)
      .orderBy("g").collect()
    assert(got(0).getAs[Long]("n_kmv") == 2L)
    assert(got(1).getAs[Long]("n_kmv") == 0L
      && got(1).isNullAt(got(1).fieldIndex("kth_hash"))
      && got(1).getAs[Double]("estimate") == 0.0)
  }

  test("grouped kmv buffer stays capped on a hot group (estimate still sane)") {
    val hot = (1 to 50000).map(i => ("hot", i)).toDF("g", "v")
    val row = Sketches.kmvDistinctByGroup(hot, Seq(col("g")), col("v"), 64)
      .collect().head
    assert(row.getAs[Long]("n_kmv") == 64L)
    val est = row.getAs[Double]("estimate")
    assert(math.abs(est - 50000.0) / 50000.0 < 0.4, s"estimate $est")
  }

  test("topk_ids agg matches the window row_number form, partition-invariant") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 2000).map(i => (s"g${i % 4}", i.toLong, rnd.nextInt(500).toDouble))
      .toDF("g", "id", "v")
    def windowForm(d: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("g", "rn", "v", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSet
    }
    def aggForm(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("g"))
        .agg(graft.functions.TopKByAgg.topKIds(spark, col("v"), col("id"), 5).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rn"), col("col.ord"), col("col.id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSet
    assert(aggForm(df) == windowForm(df))
    assert(aggForm(df.repartition(13)) == aggForm(df))
  }

  test("topk_ids: nulls skipped, undersized groups return what exists, SQL callable") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      ("a", Option(1L), Option(5.0)), ("a", Option(2L), Option.empty[Double]),
      ("a", Option.empty[Long], Option(9.0)), ("b", Option(3L), Option(1.0)),
    ).toDF("g", "id", "v")
    df.createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT g, size(topk_ids(v, id, 3)) AS n FROM topk_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 1), ("b", 1)))
  }

  test("native aggregates run with map-side partial aggregation (plan shape)") {
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val kmvPlan = Sketches.kmvDistinctByGroup(df, Seq(col("g")), col("id"), 8)
      .queryExecution.executedPlan.toString()
    assert(kmvPlan.contains("partial_kmv_sketch"), s"no partial agg:\n$kmvPlan")
    val topPlan = df.groupBy(col("g"))
      .agg(graft.functions.TopKByAgg.topKIds(spark, col("v"), col("id"), 3))
      .queryExecution.executedPlan.toString()
    assert(topPlan.contains("partial_topk_ids"), s"no partial agg:\n$topPlan")
  }

  test("kmv_sketch is callable from SQL after registration") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    (1 to 100).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "h")
      .createOrReplaceTempView("kmv_sql_in")
    val rows = spark.sql(
      "SELECT g, kmv_sketch(h, 8).n_kmv AS n FROM kmv_sql_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("g0", 8L), ("g1", 8L)))
  }

  test("histogram quantiles: within step/2 of the exact quantile, partition-invariant") {
    val df = (1 to 10000).map(_.toLong).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), step = 100L, qs = Seq(0.5, 0.9, 1.0))
      .orderBy("q").collect()
      .map(r => (r.getAs[Double]("q"), r.getAs[Long]("approx"))).toSeq
    // exact quantiles of 1..10000: 5000, 9000, 10000
    assert(math.abs(got(0)._2 - 5000L) <= 50L)
    assert(math.abs(got(1)._2 - 9000L) <= 50L)
    assert(math.abs(got(2)._2 - 10000L) <= 50L)
    val got2 = Sketches.histogramQuantiles(df.repartition(7), col("v"), 100L, Seq(0.5, 0.9, 1.0))
      .orderBy("q").collect().map(r => (r.getAs[Double]("q"), r.getAs[Long]("approx"))).toSeq
    assert(got2 == got)
  }

  test("histogram quantiles: negative domain and validation") {
    val df = Seq(-1000L, -500L, -1L, 1L, 500L).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), step = 10L, qs = Seq(1.0))
      .collect().head.getAs[Long]("approx")
    assert(got >= 500L - 10L && got <= 500L + 10L)
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(df, col("v"), step = 0L, qs = Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(df, col("v"), step = 10L, qs = Seq(0.0))
    }
  }

  test("heavy hitters: count-desc then key-asc, exactly k rows") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("k")
    val out = Skew.heavyHitters(df, col("k"), 3)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"))).toSeq
    assert(out == Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }

  // ------------------------------------------------------------ Count-Min

  /** Plain-Scala re-derivation of the CMS counter matrix. */
  private def cmsBrute(values: Seq[String], depth: Int, width: Int): Array[Long] = {
    val buf = new Array[Long](depth * width)
    values.foreach { v =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
      (0 until depth).foreach { r =>
        buf(r * width + graft.functions.CountMinAgg.bucket(h, r, width)) += 1L
      }
    }
    buf
  }

  test("cms counters match a brute-force re-derivation, partition-invariant") {
    val values = (1 to 400).map(i => s"k${i % 23}")
    for (n <- Seq(1, 7)) {
      val df = values.toDF("v").repartition(n)
      val out = Sketches.cmsSketchByGroup(df, Seq(lit(1).as("g")), col("v"), 4, 16)
        .collect().head
      assert(out.getAs[Long]("total") == 400L)
      assert(out.getAs[scala.collection.Seq[Long]]("counters").toSeq == cmsBrute(values, 4, 16).toSeq)
    }
  }

  test("cms point estimates never underestimate and are exact without collisions") {
    val values = (1 to 300).flatMap(i => Seq.fill(i % 5 + 1)(s"w${i % 11}"))
    val df = values.toDF("v")
    val sk = Sketches.cmsSketchByGroup(df, Seq(lit(1).as("g")), col("v"), 4, 8)
    val probes = values.distinct.toDF("v")
    val out = probes.crossJoin(broadcast(sk.drop("g")))
      .select(col("v"), Sketches.cmsEstimate(col("counters"), col("v"), 4, 8).as("est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (v, c) => assert(out(v) >= c, s"$v: est ${out(v)} < exact $c") }
    // a sketch wider than the key space with depth 4 resolves all 11 keys here
    val wide = Sketches.cmsSketchByGroup(df, Seq(lit(1).as("g")), col("v"), 4, 512)
    val outWide = probes.crossJoin(broadcast(wide.drop("g")))
      .select(col("v"), Sketches.cmsEstimate(col("counters"), col("v"), 4, 512).as("est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    exact.foreach { case (v, c) => assert(outWide(v) == c) }
  }

  test("cms skips nulls; an all-null group reports an empty sketch") {
    val df = Seq(("a", Some("x")), ("a", None), ("b", None), ("b", None))
      .toDF("g", "v")
    val out = Sketches.cmsSketchByGroup(df, Seq(col("g")), col("v"), 2, 4)
      .orderBy(col("g")).collect()
    assert(out(0).getAs[Long]("total") == 1L)
    assert(out(1).getAs[Long]("total") == 0L)
    assert(out(1).getAs[scala.collection.Seq[Long]]("counters").forall(_ == 0L))
    // NULL probe value -> NULL estimate
    val est = Sketches.cmsSketchByGroup(df, Seq(lit(1).as("g")), col("v"), 2, 4)
      .select(Sketches.cmsEstimate(col("counters"), lit(null).cast("string"), 2, 4))
      .collect().head
    assert(est.isNullAt(0), s"est=$est")
  }

  test("cms join-size estimate: >= true inner product, exact without collisions") {
    val a = (1 to 300).map(i => s"k${i % 20}")  // 20 keys, 15 each
    val b = (1 to 100).map(i => s"k${i % 25}")  // 25 keys (5 unmatched), 4 each
    val trueJoin = a.flatMap(x => b.filter(_ == x)).size.toLong // sum cA(k)*cB(k)
    def est(width: Int, dfA: Seq[String], dfB: Seq[String], parts: Int): Long = {
      val sa = Sketches.cmsSketchByGroup(
        dfA.toDF("v").repartition(parts), Seq(lit(1).as("g")), col("v"), 4, width)
        .select(col("counters").as("ca"))
      val sb = Sketches.cmsSketchByGroup(
        dfB.toDF("v").repartition(parts), Seq(lit(1).as("g")), col("v"), 4, width)
        .select(col("counters").as("cb"))
      sa.crossJoin(sb)
        .select(Sketches.cmsJoinSizeEstimate(col("ca"), col("cb"), 4, width))
        .collect().head.getLong(0)
    }
    val narrow = est(8, a, b, 3)
    assert(narrow >= trueJoin, s"narrow $narrow < true $trueJoin")
    // wide sketch: 4 independent rows over 4096 buckets for 25 keys —
    // a surviving collision in EVERY row is (~25*25/4096)^4-improbable
    assert(est(4096, a, b, 3) == trueJoin)
    // partitioning invariance of the whole pipeline
    assert(est(8, a, b, 1) == narrow)
  }

  test("cms_sketch is callable from SQL and rejects bad shapes") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq("x", "y", "x").toDF("v").createOrReplaceTempView("cms_in")
    val row = spark.sql(
      """SELECT cms_sketch(CAST(conv(substr(md5(v), 1, 8), 16, 10) AS BIGINT), 2, 4) AS sk
        |FROM cms_in""".stripMargin).select(col("sk.total")).collect().head
    assert(row.getLong(0) == 3L)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT cms_sketch(CAST(conv(substr(md5(v), 1, 8), 16, 10) AS BIGINT), 99, 4) FROM cms_in")
        .collect()
    }
    assert(e.getMessage.contains("depth"))
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(col("c"), col("v"), depth = 0, width = 4)
    }
  }
}
