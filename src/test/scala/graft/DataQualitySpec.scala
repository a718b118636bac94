package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expectation report: per-rule violation counts, NULL predicate violates") {
    val df = Seq(
      (Some(1L), Some(5.0)), (Some(2L), Some(-1.0)),
      (None, Some(3.0)), (Some(4L), None),
    ).toDF("id", "v")
    val out = DataQuality.expectationReport(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "v_positive" -> (col("v") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // v_positive: -1.0 fails, NULL v is an unevaluable expectation -> violation
    assert(out.toSeq == Seq(
      ("id_not_null", 4L, 1L, false), ("v_positive", 4L, 2L, false)))
    val pass = DataQuality.expectationReport(df, Seq("always" -> lit(true)))
      .collect().head
    assert(pass.getBoolean(3))
    intercept[IllegalArgumentException] {
      DataQuality.expectationReport(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("psi: identical snapshots give exactly 0; a shift gives a positive psi") {
    val a = (1 to 300).map(i => (i % 100).toLong).toDF("x")
    val same = DataQuality.psiDrift(a, a, col("x"), 0L, 100L, 10)
      .collect()
    assert(same.length == 10)
    assert(same.forall(_.getAs[Long]("psi_n9") == 0L))
    assert(same.forall(r => r.getAs[Long]("contrib_n9") == 0L))
    val shifted = (1 to 300).map(i => (i % 100 + 50).toLong).toDF("x")
    val psi = DataQuality.psiDrift(a, shifted, col("x"), 0L, 100L, 10)
      .collect().head.getAs[Long]("psi_n9")
    assert(psi > 250000000L, s"psi_n9=$psi") // half the mass left its bins: 'shifted'
  }

  test("psi: out-of-range values clamp into edge bins, nulls drop, layout-invariant") {
    val a = Seq(-50L, 0L, 99L, 250L).toDF("x") // -50 -> bin 0, 250 -> bin 9
    val b = Seq(Some(10L), None).toDF("x")
    val rows = DataQuality.psiDrift(a, b, col("x"), 0L, 100L, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows(0) == ((0, 2L, 0L))) // -50 and 0
    assert(rows(9) == ((9, 2L, 0L))) // 99 and 250
    assert(rows.map(_._3).sum == 1L) // the null dropped
    val one = DataQuality.psiDrift(a.coalesce(1), b, col("x"), 0L, 100L, 10).collect().toSeq
    val many = DataQuality.psiDrift(a.repartition(5), b, col("x"), 0L, 100L, 10).collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] {
      DataQuality.psiDrift(a, b, col("x"), 0L, 100L, 1)
    }
    intercept[IllegalArgumentException] {
      DataQuality.psiDrift(a, b, col("x"), 100L, 100L, 10)
    }
  }

  test("ks drift: identical snapshots give 0; disjoint halves give 1; exact CDF math") {
    val a = (1 to 100).map(i => (i % 50).toLong).toDF("x")
    val same = DataQuality.ksDrift(a, a, col("x"), 0L, 100L, 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getAs[Double]("ks") == 0.0))
    // disjoint supports: a lives in [0,50), b in [50,100) — some prefix
    // of bins holds ALL of a and NONE of b, so ks is exactly 1
    val b = (1 to 80).map(i => (50 + i % 50).toLong).toDF("x")
    val rows = DataQuality.ksDrift(a, b, col("x"), 0L, 100L, 10).collect()
    assert(rows.head.getAs[Double]("ks") == 1.0)
    // exact CDF at bin 4 (covers values < 50): all of a, none of b
    val bin4 = rows.find(_.getInt(0) == 4).get
    assert(bin4.getAs[Long]("cum_a") == 100L && bin4.getAs[Long]("cum_b") == 0L)
    assert(bin4.getAs[Double]("cdf_a") == 1.0 && bin4.getAs[Double]("cdf_b") == 0.0)
    val one = DataQuality.ksDrift(a.coalesce(1), b, col("x"), 0L, 100L, 10).collect().toSeq
    val many = DataQuality.ksDrift(a.repartition(5), b.repartition(3),
      col("x"), 0L, 100L, 10).collect().toSeq
    assert(one == many)
    intercept[IllegalArgumentException] { DataQuality.ksDrift(a, b, col("x"), 0L, 0L, 10) }
    intercept[Exception] { // loud on an empty side, not a silent NULL CDF
      DataQuality.ksDrift(a.filter(col("x") < -1), b, col("x"), 0L, 100L, 10).collect()
    }
  }

  test("wilson rate: hand-checked bounds, degenerate rates stay clamped, NULL fails") {
    val df = (Seq.fill(80)(("g1", Some(true))) ++ Seq.fill(20)(("g1", Some(false))) ++
      Seq.fill(5)(("g2", Some(true))) ++
      Seq.fill(4)(("g3", Some(false))) ++ Seq(("g3", None))).toDF("g", "ok")
    val rows = DataQuality.rateWithWilson(df, col("g"), col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Double]("rate"),
          r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    // g1: 80/100 — canonical Wilson bounds around 0.8
    val (n1, k1, r1, lo1, hi1) = rows("g1")
    assert(n1 == 100L && k1 == 80L && r1 == 0.8)
    assert(lo1 > 0.70 && lo1 < 0.8 && hi1 > 0.8 && hi1 < 0.88)
    // hand-replay the exact chain for the lower bound
    val z2 = 1.96 * 1.96
    val p = 80.0 / 100.0; val nd = 100.0
    val center = p + z2 / (2.0 * nd)
    val half = 1.96 * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * (nd * nd)))
    assert(lo1 == math.max(0.0, (center - half) / (1.0 + z2 / nd)))
    // g2: all successes — rate 1, hi clamps to 1, lo strictly below 1
    val (_, _, r2, lo2, hi2) = rows("g2")
    assert(r2 == 1.0 && hi2 == 1.0 && lo2 < 1.0 && lo2 > 0.4)
    // g3: NULL predicate counts as failure -> k=0 of 5
    val (n3, k3, r3, lo3, _) = rows("g3")
    assert(n3 == 5L && k3 == 0L && r3 == 0.0 && lo3 == 0.0)
  }

  test("binned auc: perfect separation 1, anti-separation 0, within-bucket ties half") {
    def df(rows: Seq[(Double, Boolean)]) = rows.toDF("s", "y")
    // positives all score high, negatives low, distinct buckets
    val perfect = df(Seq((0.9, true), (0.8, true), (0.1, false), (0.2, false)))
    assert(DataQuality.binnedAuc(perfect, col("s"), col("y"), 0.0, 1.0, 10)
      .collect().head.getAs[Double]("auc") == 1.0)
    val inverted = df(Seq((0.1, true), (0.2, true), (0.9, false), (0.8, false)))
    assert(DataQuality.binnedAuc(inverted, col("s"), col("y"), 0.0, 1.0, 10)
      .collect().head.getAs[Double]("auc") == 0.0)
    // everything in ONE bucket: pure tie -> exactly 0.5
    val tied = df(Seq((0.55, true), (0.55, false), (0.55, true), (0.55, false)))
    assert(DataQuality.binnedAuc(tied, col("s"), col("y"), 0.0, 1.0, 10)
      .collect().head.getAs[Double]("auc") == 0.5)
    // layout invariance + loud failure without both classes
    val one = DataQuality.binnedAuc(perfect.coalesce(1), col("s"), col("y"), 0.0, 1.0, 10)
      .collect().toSeq
    val many = DataQuality.binnedAuc(perfect.repartition(5), col("s"), col("y"), 0.0, 1.0, 10)
      .collect().toSeq
    assert(one == many)
    intercept[Exception] {
      DataQuality.binnedAuc(df(Seq((0.5, true))), col("s"), col("y"), 0.0, 1.0, 10).collect()
    }
    intercept[IllegalArgumentException] {
      DataQuality.binnedAuc(perfect, col("s"), col("y"), 1.0, 1.0, 10)
    }
  }

  test("chi-square: hand-computed 2x2, closed form matches the definition") {
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))).toDF("r0", "c0")
    val rows = DataQuality.chiSquare(df, col("r0"), col("c0"))
      .collect()
    val byCell = rows.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getAs[Long](3)))).toMap
    assert(byCell(("a", "x")) == ((10L, 12000000000L)))
    assert(byCell(("b", "y")) == ((40L, 42000000000L)))
    // closed form: Σ round(o²/e · 10⁹) long-summed = 100793650793 nanos
    // exactly, then − 100·10⁹ staying BIGINT (the defined cross-engine
    // semantics — no DECIMAL or raw-double output column ever ships)
    assert(rows.head.getAs[Long]("chi2_n9") == 793650793L)
    assert(rows.head.getAs[Long]("dof") == 1L)
  }

  test("chi-square: independent facets give chi2 exactly 0; NULL level counts in dof") {
    val ind = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(3)(("b", "x")) ++ Seq.fill(3)(("b", "y"))).toDF("r0", "c0")
    val r = DataQuality.chiSquare(ind, col("r0"), col("c0")).collect().head
    assert(r.getAs[Long]("chi2_n9") == 0L)
    val withNull = Seq(("a", Some("x")), ("a", None), ("b", Some("x")), ("b", None))
      .toDF("r0", "c0")
    val rows = DataQuality.chiSquare(withNull, col("r0"), col("c0")).collect()
    assert(rows.length == 4) // the NULL column level forms real cells
    assert(rows.head.getAs[Long]("dof") == 1L) // (2-1) * (2-1): NULL counted
    val one = DataQuality.chiSquare(withNull.coalesce(1), col("r0"), col("c0"))
      .collect().toSeq
    val many = DataQuality.chiSquare(withNull.repartition(5), col("r0"), col("c0"))
      .collect().toSeq
    assert(one == many)
  }

  test("confusion matrix: per-cell recall share; NULL prediction is a real level") {
    val df = (Seq.fill(8)(("en", "en")) ++ Seq.fill(2)(("en", "de")) ++
      Seq.fill(5)(("de", "de")) ++ Seq(("de", null))).toDF("a", "p")
    val out = DataQuality.confusionMatrix(df, col("a"), col("p"))
      .collect().map(r => ((r.getString(0), Option(r.getString(1))),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("en", Some("en"))) == ((8L, 8.0 / 10.0))) // en recall 0.8
    assert(out(("en", Some("de"))) == ((2L, 2.0 / 10.0)))
    assert(out(("de", Some("de"))) == ((5L, 5.0 / 6.0)))
    assert(out(("de", None)) == ((1L, 1.0 / 6.0))) // null prediction kept
  }

  test("calibration: bin rates and clamped edges; NULL score/label rows excluded") {
    val df = Seq(
      (0.55, Some(true)), (0.55, Some(false)),   // bin 5 (for [0,1) x10)
      (0.95, Some(true)), (0.95, Some(true)),    // bin 9
      (1.50, Some(true)),                        // clamps into bin 9
      (-0.3, Some(false)),                       // clamps into bin 0
      (0.5, None),                               // null label: excluded
    ).toDF("s", "y")
    val out = DataQuality.calibrationReport(df, col("s"), col("y"), 0.0, 1.0, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0, 1L, 0L, 0.0),
      (5, 2L, 1L, 0.5),
      (9, 3L, 3L, 1.0)))
    // mean_score is the decimal-exact average: bin 9 = (0.95+0.95+1.5)/3
    val m9 = DataQuality.calibrationReport(df, col("s"), col("y"), 0.0, 1.0, 10)
      .filter(col("bucket") === 9).collect().head.getAs[Double]("mean_score")
    assert(m9 == BigDecimal("3.400000000").toDouble / 3.0)
    intercept[IllegalArgumentException] {
      DataQuality.calibrationReport(df, col("s"), col("y"), 1.0, 1.0, 10)
    }
  }

  test("profile: per-column nulls/distincts/minmax; complex columns nulls-only") {
    val df = Seq(
      (1L, Some("b"), Seq(1, 2)),
      (2L, Some("a"), Seq(3)),
      (3L, None, null.asInstanceOf[Seq[Int]]),
      (4L, Some("a"), Seq(4)),
    ).toDF("id", "s", "arr")
    val out = DataQuality.profileFrame(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val idp = out("id")
    assert((idp.getString(1), idp.getLong(2), idp.getLong(3), idp.getLong(4),
      idp.getString(5), idp.getString(6)) == (("bigint", 4L, 0L, 4L, "1", "4")))
    val sp = out("s")
    assert((sp.getLong(3), sp.getLong(4), sp.getString(5), sp.getString(6)) ==
      ((1L, 2L, "a", "b")))
    val ap = out("arr")
    assert(ap.getString(1).startsWith("array"))
    assert(ap.getLong(3) == 1L)
    assert(ap.isNullAt(4) && ap.isNullAt(5) && ap.isNullAt(6))
  }

  test("kAnonymity: class accounting, NULL is a real class") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("NY", 30), ("NY", 30), ("NY", 30),   // class of 3
      ("SF", 40), ("SF", 40),               // class of 2
      ("LA", 50),                           // class of 1 -> violator
      (null.asInstanceOf[String], 30), (null, 30), // NULL class of 2
    ).toDF("city", "age")
    val r = DataQuality.kAnonymity(rows, Seq(col("city"), col("age")), k = 2L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5)) == ((8L, 4L, 1L, 1L, 1L, false)))
    val ok = DataQuality.kAnonymity(
      rows.filter(col("city").isNotNull && col("city") =!= "LA"),
      Seq(col("city"), col("age")), k = 2L).collect().head
    assert(ok.getBoolean(5), "suppressing the singleton restores 2-anonymity")
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq.empty, k = 2L)
    }
  }

  test("referentialIntegrity: orphans and null FKs accounted separately") {
    import org.apache.spark.sql.functions.col
    val parent = Seq(1L, 2L, 2L).toDF("pk") // duplicate parent keys collapse
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None).toDF("fk")
    val r = DataQuality.referentialIntegrity(child, col("fk"), parent, col("pk"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ((5L, 1L, 1L, false)))
    val clean = DataQuality.referentialIntegrity(
      child.filter(col("fk").isin(1L, 2L)), col("fk"), parent, col("pk"))
      .collect().head
    assert(clean.getBoolean(3) && clean.getLong(2) == 0L)
  }

  test("tCloseness: skewed class distance, matching class is 0, NULL class real") {
    import org.apache.spark.sql.functions.col
    // global: A 4/8, B 4/8. class (NY,30): all A -> tvd = 1/2.
    // class (SF,40): 2A 2B == global -> tvd 0. NULL city class: all B.
    val rows = Seq(
      ("NY", 30, "A"), ("NY", 30, "A"),
      ("SF", 40, "A"), ("SF", 40, "A"), ("SF", 40, "B"), ("SF", 40, "B"),
      (null.asInstanceOf[String], 50, "B"), (null, 50, "B"),
    ).toDF("city", "age", "disease")
    val got = DataQuality.tCloseness(rows, Seq(col("city"), col("age")), col("disease"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val byCity = got.map(t => t._1 -> t).toMap
    assert(byCity("NY")._4 == 0.5, byCity("NY").toString)
    assert(byCity("SF")._4 == 0.0)
    assert(byCity("<null>")._4 == 0.5, "NULL class audits like any other")
    // exact numerators: NY n_c=2, N=8: |2*8-4*2| + |0*8-4*2| = 8+8 = 16
    assert(byCity("NY")._3 == 16L && byCity("NY")._2 == 2L)
  }

  test("lDiversity: homogeneous k-anonymous class still fails") {
    import org.apache.spark.sql.functions.col
    // class (NY,30): 3 rows but ALL share disease A -> d=1, not 2-diverse
    // even though it IS 3-anonymous; class (SF,40): 2 rows, 2 diseases -> ok
    val rows = Seq(
      ("NY", 30, "A"), ("NY", 30, "A"), ("NY", 30, "A"),
      ("SF", 40, "A"), ("SF", 40, "B"),
    ).toDF("city", "age", "disease")
    val r = DataQuality.lDiversity(rows, Seq(col("city"), col("age")),
      col("disease"), l = 2L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5)) == ((5L, 2L, 1L, 1L, 3L, false)))
    // and the same data IS 2-anonymous — the two audits measure
    // different attacks
    assert(DataQuality.kAnonymity(rows, Seq(col("city"), col("age")), k = 2L)
      .collect().head.getBoolean(5))
  }

  test("groupTrend: exact OLS slope per group, single-minute groups NULL") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val rows = Seq(
      // group a: y = 10 + 2*minute -> slope 2
      ("a", "2024-01-01 00:00:00", 10L), ("a", "2024-01-01 00:01:00", 12L),
      ("a", "2024-01-01 00:02:00", 14L), ("a", "2024-01-01 00:03:00", 16L),
      // group b: flat -> slope 0
      ("b", "2024-01-01 00:00:00", 5L), ("b", "2024-01-01 00:05:00", 5L),
      // group c: one minute only -> undefined
      ("c", "2024-01-01 00:00:10", 7L), ("c", "2024-01-01 00:00:50", 9L),
    ).toDF("g", "ts_s", "y").withColumn("ts", to_timestamp(col("ts_s")))
    val got = DataQuality.groupTrend(rows, col("g"), col("ts"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(4) == 2.0, got("a").toString)
    assert(got("b").getDouble(4) == 0.0)
    assert(got("c").isNullAt(4), "zero x-variance is undefined, not 0")
    // deterministic across partitionings
    val d1 = DataQuality.groupTrend(rows.repartition(5), col("g"), col("ts"), col("y"))
      .collect().map(_.toSeq).toSeq
    val d2 = DataQuality.groupTrend(rows, col("g"), col("ts"), col("y"))
      .collect().map(_.toSeq).toSeq
    assert(d1 == d2)
  }

  test("pearsonCorr: exact moments, known correlations, zero-variance NULL") {
    import org.apache.spark.sql.functions.col
    // y = 2x + 1 -> perfect positive correlation
    val lin = Seq((1L, 3L), (2L, 5L), (3L, 7L), (4L, 9L)).toDF("x", "y")
    val r1 = DataQuality.pearsonCorr(lin, col("x"), col("y")).collect().head
    assert(r1.getLong(0) == 4L && math.abs(r1.getDouble(4) - 1.0) < 1e-12)
    // y = -x -> perfect negative
    val neg = Seq((1L, -1L), (2L, -2L), (3L, -3L)).toDF("x", "y")
    assert(math.abs(DataQuality.pearsonCorr(neg, col("x"), col("y"))
      .collect().head.getDouble(4) + 1.0) < 1e-12)
    // constant y -> undefined (NULL)
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    assert(DataQuality.pearsonCorr(const, col("x"), col("y")).collect().head.isNullAt(4))
    // deterministic across partitionings (integer moments)
    val big = (1L to 1000L).map(i => (i, (i * 7) % 13)).toDF("x", "y")
    val a = DataQuality.pearsonCorr(big.repartition(11), col("x"), col("y"))
      .collect().head.getDouble(4)
    val b = DataQuality.pearsonCorr(big, col("x"), col("y")).collect().head.getDouble(4)
    assert(a == b)
  }

  test("keyAudit: uniqueness, nulls, multiplicity accounting") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(1L), Some(2L), Some(2L), Some(2L), Some(3L), None, None)
      .toDF("k")
    val r = DataQuality.keyAudit(df, col("k")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((7L, 2L, 3L, 1L, 3L, 2L)))
    // a clean unique key audits clean
    val clean = DataQuality.keyAudit(Seq(1L, 2L, 3L).toDF("k"), col("k"))
      .collect().head
    assert((clean.getLong(3), clean.getLong(4), clean.getLong(5)) == ((0L, 1L, 0L)))
  }

  test("wassersteinDrift: shifted mass integrates, identical sides are 0") {
    import org.apache.spark.sql.functions.col
    // a: uniform over buckets 0..3 (values 0,10,20,30); b: same shifted
    // +10 (the top point clamps into the last bucket) -> CDF gaps
    // 1/4,1/4,1/4,0 over 10-wide bins: W1 = 7.5
    val a = Seq(0.0, 10.0, 20.0, 30.0).toDF("v")
    val b = Seq(10.0, 20.0, 30.0, 39.0).toDF("v")
    val got = DataQuality.wassersteinDrift(a, b, col("v"), 0L, 40L, 4)
      .collect()
    assert(got.length == 4)
    assert(got.head.getAs[Long]("w1_num") == 12L)
    assert(got.head.getAs[Double]("w1") == 7.5, got.head.toString)
    // identical inputs -> 0 drift
    val z = DataQuality.wassersteinDrift(a, a, col("v"), 0L, 40L, 4)
      .collect().head
    assert(z.getAs[Long]("w1_num") == 0L && z.getAs[Double]("w1") == 0.0)
    // unequal sample sizes: the common-denominator numerators stay exact
    val c = Seq(0.0, 0.0, 10.0, 10.0, 20.0, 20.0, 30.0, 30.0).toDF("v")
    val e = DataQuality.wassersteinDrift(a, c, col("v"), 0L, 40L, 4)
      .collect().head
    assert(e.getAs[Double]("w1") == 0.0, "same distribution at 2x n")
    intercept[Exception] {
      DataQuality.wassersteinDrift(a, b.filter(col("v") < 0), col("v"), 0L, 40L, 4)
        .collect()
    }
  }

  test("robustOutliers: median/MAD flags resist the heavy tail") {
    import org.apache.spark.sql.functions.col
    // group a: 9 values near 10 plus one extreme; MAD ~1 so 1000 flags,
    // but a mean/std z-score at 3 sigma would NOT flag it as crisply
    val rows = (Seq.tabulate(9)(i => ("a", 8.0 + i * 0.5)) :+ (("a", 1000.0))) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0)) // MAD 0: nothing off-median
    val got = DataQuality.robustOutliers(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 10L)
    assert(a.getDouble(2) == 10.25) // median of 8.0,8.5..12.0,1000
    assert(a.getLong(4) == 1L, s"exactly the extreme value flags: $a")
    val b = got("b")
    assert(b.getDouble(3) == 0.0 && b.getLong(4) == 0L)
    // deterministic across partitionings
    val d1 = DataQuality.robustOutliers(rows.toDF("g", "v").repartition(5), col("g"), col("v"))
      .collect().map(_.toSeq).toSeq
    val d2 = DataQuality.robustOutliers(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(_.toSeq).toSeq
    assert(d1 == d2)
  }

  test("krippendorffAlpha: hand-computed nominal cases") {
    import org.apache.spark.sql.functions.col
    def alpha(rows: Seq[(String, String, String)]) = {
      val df = rows.toDF("u", "a", "l")
      DataQuality.krippendorffAlpha(df, col("u"), col("a"), col("l")).collect().head
    }
    // one agreeing + one disagreeing 2-rating unit: Do = De = 0.5 -> alpha 0
    val r0 = alpha(Seq(("u1", "a1", "A"), ("u1", "a2", "A"),
      ("u2", "a1", "A"), ("u2", "a2", "B")))
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == ((2L, 4L, 2L)))
    assert(r0.getLong(3) == 500000L && r0.getLong(4) == 500000L)
    assert(r0.getLong(5) == 0L)
    // perfect agreement across two label levels -> alpha 1
    val r1 = alpha(Seq(("u1", "a1", "A"), ("u1", "a2", "A"),
      ("u2", "a1", "B"), ("u2", "a2", "B")))
    assert(r1.getLong(5) == 1000000L)
    // no label variation at all -> alpha undefined (NULL)
    val r2 = alpha(Seq(("u1", "a1", "A"), ("u1", "a2", "A"),
      ("u2", "a1", "A"), ("u2", "a2", "A")))
    assert(r2.isNullAt(5))
    // single-rating units and duplicate (unit, annotator) slots are inert:
    // the dup collapses to its min label, the singleton never pairs
    val r3 = alpha(Seq(("u1", "a1", "A"), ("u1", "a1", "B"), ("u1", "a2", "A"),
      ("u2", "a1", "A"), ("u2", "a2", "B"), ("u3", "a1", "B")))
    assert((r3.getLong(0), r3.getLong(1)) == ((2L, 4L)))
    assert(r3.getLong(5) == r0.getLong(5))
  }
  test("benford: hand-computed digit counts, deviations, and TV; zeros/nulls drop") {
    val df = Seq(Some(10L), Some(11L), Some(-12L), Some(20L), Some(3L), Some(0L), None)
      .toDF("v")
    val rows = DataQuality.benfordAudit(df, col("v")).collect()
    assert(rows.length == 9)
    val byDigit = rows.map(r => (r.getInt(0),
      (r.getAs[Long]("o"), r.getAs[Long]("share_n9"), r.getAs[Long]("dev_n9")))).toMap
    assert(byDigit(1) == ((3L, 301029996L, 1494850020L))) // |3e9 - 5*share|
    assert(byDigit(2) == ((1L, 176091259L, 119543705L)))
    assert(byDigit(4) == ((0L, 96910013L, 484550065L))) // absent digit: o=0
    assert(rows.forall(_.getAs[Long]("n") == 5L))
    // tv = sum(dev) div (2*5) — exact integer arithmetic end to end
    assert(rows.head.getAs[Long]("tv_n9") == 397940008L)
    val one = DataQuality.benfordAudit(df.coalesce(1), col("v")).collect().toSeq
    val many = DataQuality.benfordAudit(df.repartition(5), col("v")).collect().toSeq
    assert(one == many)
  }
  test("schema drift: one-sided columns, dtype change, exact ppm null shift") {
    val a = Seq((1L, Some("x"), 1.0), (2L, None, 2.0), (3L, Some("z"), 3.0))
      .toDF("id", "tag", "v")
    val b = Seq((1, Some("x")), (2, None), (3, None), (4, Some("w")))
      .toDF("id", "tag") // id narrowed to int, v dropped
      .withColumn("extra", lit(true))
    val rows = DataQuality.schemaDrift(a, b).collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(rows.map(_.getString(0)).toSeq == Seq("extra", "id", "tag", "v")) // ordered
    val id = byCol("id")
    assert(id.getAs[String]("dtype_a") == "bigint" && id.getAs[String]("dtype_b") == "int")
    assert(id.getAs[Boolean]("type_changed"))
    assert(id.getAs[Long]("n_rows_a") == 3L && id.getAs[Long]("n_rows_b") == 4L)
    val tag = byCol("tag")
    assert(!tag.getAs[Boolean]("type_changed"))
    assert(tag.getAs[Long]("null_ppm_a") == 333333L) // 1*1e6 div 3, truncating
    assert(tag.getAs[Long]("null_ppm_b") == 500000L)
    assert(tag.getAs[Long]("null_ppm_delta") == 166667L)
    assert(tag.getAs[Long]("n_distinct_a") == 2L && tag.getAs[Long]("n_distinct_b") == 2L)
    val v = byCol("v") // a-side only: b side NULL, never dropped
    assert(v.getAs[String]("dtype_a") == "double" && v.isNullAt(v.fieldIndex("dtype_b")))
    assert(v.getAs[Boolean]("type_changed"))
    assert(v.getAs[Long]("null_ppm_delta") == 0L - 0L)
    val e = byCol("extra")
    assert(e.isNullAt(e.fieldIndex("dtype_a")) && e.getAs[String]("dtype_b") == "boolean")
  }

  test("giniCoefficient: textbook values, ties, equality zero, negative raises") {
    // [1,2,3,4] -> G = 0.25; all-equal -> 0; [0,0,0,12] -> (n-1)/n = 0.75
    assert(DataQuality.giniCoefficient(Seq(1L, 2L, 3L, 4L).toDF("v"), col("v"))
      .collect()(0).getDouble(3) == 0.25)
    assert(DataQuality.giniCoefficient(Seq(7L, 7L, 7L).toDF("v"), col("v"))
      .collect()(0).getDouble(3) == 0.0)
    assert(DataQuality.giniCoefficient(Seq(0L, 0L, 0L, 12L).toDF("v"), col("v"))
      .collect()(0).getDouble(3) == 0.75)
    // tied group spanning ranks: [1,1,2] -> 2/(3*4)
    val t = DataQuality.giniCoefficient(Seq(1L, 1L, 2L).toDF("v"), col("v")).collect()(0)
    assert(t.getLong(0) == 3L && t.getLong(1) == 4L && t.getLong(2) == 2L)
    assert(t.getDouble(3) == 2.0 / 12.0)
    // negative values raise instead of returning a wrong coefficient
    val ex = intercept[Exception] {
      DataQuality.giniCoefficient(Seq(-1L, 5L).toDF("v"), col("v")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("mannWhitneyU: hand-ranked U with ties, doubled-U invariant, z sign and degeneracy") {
    // A = [1,2,3], B = [2,3,4]: R_A = 1 + 2.5 + 4.5 = 8 -> U1 = 2 (x2 = 4)
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 3L, 4L).toDF("v")
    val r = DataQuality.mannWhitneyU(a, b, col("v")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 14L)
    assert(r.getLong(2) + r.getLong(3) == 2L * r.getLong(0) * r.getLong(1))
    assert(r.getLong(4) == 12L) // two tie groups of 2: 2*(8-2)
    assert(r.getDouble(5) < 0.0) // A stochastically below B
    // clearly shifted distributions: |z| large, direction correct
    val lo = (0L until 200L).toDF("v")
    val hi = (150L until 350L).toDF("v")
    val z = DataQuality.mannWhitneyU(lo, hi, col("v")).collect()(0).getDouble(5)
    assert(z < -10.0, s"expected strongly negative z, got $z")
    // identical singletons everywhere: variance degenerates -> NULL z
    val allTied = Seq(7L, 7L, 7L).toDF("v")
    val t = DataQuality.mannWhitneyU(allTied, allTied, col("v")).collect()(0)
    assert(t.isNullAt(5))
    // empty side: NULL z, zero counts survive
    val e = DataQuality.mannWhitneyU(a.filter(col("v") > 100), b, col("v")).collect()(0)
    assert(e.getLong(0) == 0L && e.isNullAt(5))
  }
}
