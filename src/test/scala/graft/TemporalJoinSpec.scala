package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // probe side: (key, pid, ts)
  private def probes = Seq(
    ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 5L),
    ("b", 4L, 100L),
    ("c", 5L, 50L), // key with no reference rows at all
  ).toDF("k", "pid", "pts")

  // reference side: (key, ts, val)
  private def refs = Seq(
    ("a", 8L, "r8"), ("a", 10L, "r10"), ("a", 15L, "r15"),
    ("b", 200L, "r200"),
  ).toDF("k", "rts", "rv")

  private def runAsOf(direction: String, exact: Boolean = true,
      tol: Option[org.apache.spark.sql.Column] = None) =
    AsOfJoin.asOf(probes, refs, Seq("k"), "pts", "rts",
        direction = direction, allowExactMatches = exact, tolerance = tol)
      .orderBy("pid")
      .collect()
      .map(r => (r.getAs[Long]("pid"), Option(r.getAs[String]("rv")).orNull))
      .toSeq

  test("backward as-of: latest reference <= probe, exact match visible, unmatched null") {
    assert(runAsOf("backward") == Seq(
      (1L, "r10"), // exact ts=10 match allowed
      (2L, "r15"),
      (3L, null),  // nothing at or before ts=5
      (4L, null),  // only ref is at 200 > 100
      (5L, null),  // key with no refs
    ))
  }

  test("backward as-of without exact matches skips the equal-ts reference") {
    assert(runAsOf("backward", exact = false) == Seq(
      (1L, "r8"), (2L, "r15"), (3L, null), (4L, null), (5L, null)))
  }

  test("forward as-of: earliest reference >= probe") {
    assert(runAsOf("forward") == Seq(
      (1L, "r10"), (2L, null), (3L, "r8"), (4L, "r200"), (5L, null)))
  }

  test("nearest as-of: minimum absolute distance, ties take the backward row") {
    assert(runAsOf("nearest") == Seq(
      (1L, "r10"), // exact hit
      (2L, "r15"), // d5 backward vs nothing forward
      (3L, "r8"),  // d3 forward beats nothing backward
      (4L, "r200"),
      (5L, null),
    ))
    // equidistant: probe ts=10 between refs at 8 and 12 -> backward (r8)
    val p = Seq(("a", 1L, 10L)).toDF("k", "pid", "pts")
    val r = Seq(("a", 8L, "r8"), ("a", 12L, "r12")).toDF("k", "rts", "rv")
    val out = AsOfJoin.asOf(p, r, Seq("k"), "pts", "rts", direction = "nearest")
      .collect().head
    assert(out.getAs[String]("rv") == "r8")
    // nearest + tolerance: the d5 match of pid=2 drops at tol 3
    assert(runAsOf("nearest", tol = Some(lit(3L))) == Seq(
      (1L, "r10"), (2L, null), (3L, "r8"), (4L, null), (5L, null)))
    // nearest without exact matches skips the equal-ts reference
    assert(runAsOf("nearest", exact = false).take(1) == Seq((1L, "r8")))
  }

  test("tolerance nulls out matches farther than the bound") {
    // backward with numeric tolerance 3: pid=2 (pts=20, match rts=15, gap 5) drops
    assert(runAsOf("backward", tol = Some(lit(3L))) == Seq(
      (1L, "r10"), (2L, null), (3L, null), (4L, null), (5L, null)))
  }

  test("asOfLookup: tolerance and null hygiene match asOf") {
    val got = AsOfJoin.asOfLookup(probes, refs, Seq("k"), "pts", "rts",
        tolerance = Some(lit(3L)))
      .orderBy("pid").collect()
      .map(r => (r.getAs[Long]("pid"), Option(r.getAs[String]("rv")).orNull)).toSeq
    assert(got == Seq((1L, "r10"), (2L, null), (3L, null), (4L, null), (5L, null)))
    val refsWithNulls = Seq(
      (Option.empty[String], Option(1L), "nullkey"),
      (Option("a"), Option.empty[Long], "nullts"),
      (Option("a"), Option(8L), "r8"),
    ).toDF("k", "rts", "rv")
    val probesWithNulls = Seq(
      (Option("a"), 1L, Option(5L)),
      (Option.empty[String], 2L, Option(10L)),
      (Option("a"), 3L, Option.empty[Long]),
    ).toDF("k", "pid", "pts")
    val out = AsOfJoin.asOfLookup(probesWithNulls, refsWithNulls, Seq("k"), "pts", "rts",
        direction = "forward")
      .orderBy("pid").collect()
      .map(r => (r.getAs[Long]("pid"), Option(r.getAs[String]("rv")).orNull)).toSeq
    assert(out == Seq((1L, "r8"), (2L, null), (3L, null)))
  }

  test("duplicate (key, ts) reference rows resolve to the greatest payload struct") {
    val dupRefs = Seq(("a", 10L, "x1"), ("a", 10L, "x9"), ("a", 10L, "x5")).toDF("k", "rts", "rv")
    val out = AsOfJoin.asOf(probes.filter($"pid" === 1L), dupRefs, Seq("k"), "pts", "rts")
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("rv") == "x9")
  }

  test("as-of carries the matched reference timestamp and left columns through") {
    val row = AsOfJoin.asOf(probes, refs, Seq("k"), "pts", "rts")
      .filter($"pid" === 2L).collect().head
    assert(row.getAs[Long]("rts") == 15L && row.getAs[String]("k") == "a"
      && row.getAs[Long]("pts") == 20L)
  }

  test("null reference timestamps and null keys never match; null-ts probes stay unmatched") {
    val refsWithNulls = Seq(
      (Option.empty[String], Option(1L), "nullkey"),
      (Option("a"), Option.empty[Long], "nullts"),
      (Option("a"), Option(8L), "r8"),
    ).toDF("k", "rts", "rv")
    // probe at ts=5 ("a"): nothing at/before 5 except the null-ts row,
    // which must NOT win; null-key probe must not pick up the null-key ref
    val probesWithNulls = Seq(
      (Option("a"), 1L, Option(5L)),
      (Option.empty[String], 2L, Option(10L)),
      (Option("a"), 3L, Option.empty[Long]), // null probe ts
    ).toDF("k", "pid", "pts")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.asOf(probesWithNulls, refsWithNulls, Seq("k"), "pts", "rts",
          direction = dir)
        .orderBy("pid").collect()
        .map(r => (r.getAs[Long]("pid"), Option(r.getAs[String]("rv")).orNull)).toSeq
      val expected =
        if (dir == "backward") Seq((1L, null), (2L, null), (3L, null))
        else Seq((1L, "r8"), (2L, null), (3L, null))
      assert(out == expected, s"direction=$dir")
    }
  }

  test("point-in-interval stays exact beyond 2^53 (integral div binning)") {
    val base = 1L << 60
    val p = Seq((1L, base + 2L)).toDF("pid", "x")
    val i = Seq((10L, base + 1L, base + 4L), (11L, base + 5L, base + 9L)).toDF("iid", "s", "e")
    for (w <- Seq(3L, 7L)) {
      val out = RangeJoin.pointInInterval(p, i, Seq.empty, "x", "s", "e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 10L)), s"binWidth=$w")
    }
  }

  test("as-of rejects empty keys and colliding output names") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(probes, refs, Seq.empty, "pts", "rts")
    }
    val clash = refs.withColumnRenamed("rv", "pid")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(probes, clash, Seq("k"), "pts", "rts")
    }
    // ... and the prefix resolves the collision
    val out = AsOfJoin.asOf(probes, clash, Seq("k"), "pts", "rts", rightPrefix = "r_")
    assert(out.columns.contains("r_pid"))
  }

  private def points = Seq(
    ("a", 1L, 7L), ("a", 2L, 12L), ("a", 3L, 25L), ("b", 4L, 7L),
  ).toDF("k", "pid", "x")

  private def intervals = Seq(
    ("a", 10L, 5L, 14L),   // covers x=7 and x=12
    ("a", 11L, 12L, 12L),  // degenerate [12,12] covers x=12 only
    ("a", 12L, 30L, 40L),  // covers nothing
    ("b", 13L, 0L, 100L),  // wide interval, other key
  ).toDF("k", "iid", "s", "e")

  test("point-in-interval: inclusive bounds, key-scoped, exactly-once pairs") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "s", "e", binWidth = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 13L)))
  }

  test("point-in-interval: bin width does not change results (exactly-once under any width)") {
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "s", "e", binWidth = w,
          maxBinsPerInterval = 200)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(out.size == out.toSet.size, s"dup pair at binWidth=$w")
      assert(out.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 13L)), s"binWidth=$w")
    }
  }

  test("point-in-interval: negative domain floor division stays exact") {
    val p = Seq((1L, -7L)).toDF("pid", "x")
    val i = Seq((10L, -10L, -5L), (11L, -4L, 0L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, i, Seq.empty, "x", "s", "e", binWidth = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("point-in-interval: over-wide interval fails loudly, inverted interval drops") {
    val p = Seq((1L, 0L)).toDF("pid", "x")
    val wide = Seq((10L, 0L, 1000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(p, wide, Seq.empty, "x", "s", "e", binWidth = 2L,
        maxBinsPerInterval = 10).collect()
    }
    assert(ex.getMessage.contains("bins") || Option(ex.getCause).exists(_.getMessage.contains("bins")))
    val inverted = Seq((10L, 5L, 1L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(p, inverted, Seq.empty, "x", "s", "e", binWidth = 2L)
      .count() == 0L)
  }

  test("as-of matches a brute-force reference on random data (all 4 modes)") {
    val rnd = new scala.util.Random(42)
    val ks = Vector("a", "b", "c", "d")
    val probeRows = (1 to 200).map(i =>
      (ks(rnd.nextInt(4)), i.toLong, rnd.nextInt(100).toLong))
    val refRows = (1 to 150).map(i =>
      (ks(rnd.nextInt(4)), rnd.nextInt(100).toLong, s"v${rnd.nextInt(1000)}"))
    val probeDf = probeRows.toDF("k", "pid", "pts")
    val refDf = refRows.toDF("k", "rts", "rv")
    for (dir <- Seq("backward", "forward", "nearest"); exact <- Seq(true, false)) {
      val got = AsOfJoin.asOf(probeDf, refDf, Seq("k"), "pts", "rts",
          direction = dir, allowExactMatches = exact)
        .collect()
        .map(r => r.getAs[Long]("pid") -> Option(r.getAs[String]("rv")))
        .toMap
      // the dimension-table lookup form must agree with the window form
      // in every mode (documented-identical semantics)
      val gotLookup = AsOfJoin.asOfLookup(probeDf, refDf, Seq("k"), "pts", "rts",
          direction = dir, allowExactMatches = exact)
        .collect()
        .map(r => r.getAs[Long]("pid") -> Option(r.getAs[String]("rv")))
        .toMap
      assert(gotLookup == got, s"asOfLookup diverges from asOf: dir=$dir exact=$exact")
      probeRows.foreach { case (k, pid, pts) =>
        def eligible(d: String) = refRows.filter { case (rk, rts, _) =>
          rk == k && (d match {
            case "backward" => if (exact) rts <= pts else rts < pts
            case "forward"  => if (exact) rts >= pts else rts > pts
          })
        }
        def best(rows: Seq[(String, Long, String)], d: String): Option[String] =
          if (rows.isEmpty) None
          else {
            val bestTs = if (d == "backward") rows.map(_._2).max else rows.map(_._2).min
            // duplicate-(key,ts) tie-break: greatest payload struct (rts, rv)
            Some(rows.filter(_._2 == bestTs).map(_._3).max)
          }
        val expected = dir match {
          case "nearest" =>
            val bw = eligible("backward"); val fw = eligible("forward")
            val bwBest = best(bw, "backward").map(v => (bw.map(_._2).max, v))
            val fwBest = best(fw, "forward").map(v => (fw.map(_._2).min, v))
            (bwBest, fwBest) match {
              case (Some((bts, bv)), Some((fts, fv))) =>
                if (pts - bts <= fts - pts) Some(bv) else Some(fv)
              case (b, f) => b.orElse(f).map(_._2)
            }
          case d => best(eligible(d), d)
        }
        assert(got(pid) == expected, s"pid=$pid dir=$dir exact=$exact")
      }
    }
  }

  test("point-in-interval matches a brute-force nested loop on random data") {
    val rnd = new scala.util.Random(7)
    val pRows = (1 to 120).map(i => (rnd.nextInt(3).toString, i.toLong, rnd.nextInt(200).toLong))
    val iRows = (1 to 80).map { i =>
      val s = rnd.nextInt(200).toLong
      (rnd.nextInt(3).toString, (1000 + i).toLong, s, s + rnd.nextInt(30).toLong)
    }
    val pDf = pRows.toDF("k", "pid", "x")
    val iDf = iRows.toDF("k", "iid", "s", "e")
    val want = (for {
      (pk, pid, x) <- pRows
      (ik, iid, s, e) <- iRows
      if pk == ik && x >= s && x <= e
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 8L, 64L)) {
      val got = RangeJoin.pointInInterval(pDf, iDf, Seq("k"), "x", "s", "e", binWidth = w,
          maxBinsPerInterval = 100)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup pairs at w=$w")
      assert(got.toSet == want, s"binWidth=$w")
    }
  }

  test("interval overlap matches a brute-force nested loop on random data") {
    val rnd = new scala.util.Random(11)
    def mkIvals(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(150).toLong
      (rnd.nextInt(2).toString, idBase + i, s, s + rnd.nextInt(25).toLong)
    }
    val lRows = mkIvals(60, 0L)
    val rRows = mkIvals(60, 1000L)
    val lDf = lRows.toDF("k", "lid", "ls", "le")
    val rDf = rRows.toDF("k", "rid", "rs", "re")
    val want = (for {
      (lk, lid, ls, le) <- lRows
      (rk, rid, rs, re) <- rRows
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    for (w <- Seq(4L, 32L)) {
      val got = RangeJoin.intervalOverlap(lDf, rDf, Seq("k"), "ls", "le", "rs", "re",
          binWidth = w, maxBinsPerInterval = 100)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup pairs at w=$w")
      assert(got.toSet == want, s"binWidth=$w")
    }
  }

  test("interval overlap: ownership emits each overlapping pair exactly once") {
    val l = Seq(("a", 1L, 0L, 10L), ("a", 2L, 20L, 30L)).toDF("k", "lid", "ls", "le")
    val r = Seq(("a", 7L, 5L, 25L), ("a", 8L, 40L, 50L)).toDF("k", "rid", "rs", "re")
    for (w <- Seq(1L, 4L, 100L)) {
      val out = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", binWidth = w,
          maxBinsPerInterval = 200)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(out.sorted == Seq((1L, 7L), (2L, 7L)), s"binWidth=$w")
    }
  }
}
