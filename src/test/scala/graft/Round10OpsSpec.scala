package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operators: PPJoin-style exact Jaccard self-join (prefix
  * filtering) and the 2-D Pareto-frontier (skyline) selector. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixJaccardPairs emits exactly the pairs above the rational threshold") {
    // n=1 shingles = distinct tokens, so the set math is hand-checkable
    val docs = Seq(
      (1L, "a b c d"), // {a,b,c,d}
      (2L, "a b c e"), // J(1,2) = 3/5
      (3L, "x y z"), //    J(·,3) = 0
      (4L, "a b c d"), // J(1,4) = 1, J(2,4) = 3/5
    ).toDF("id", "text")
    val got = Dedup.prefixJaccardPairs(docs, col("id"), col("text"), n = 1, tNum = 1, tDen = 2)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 5L, 600000000L),
      (1L, 4L, 4L, 4L, 1000000000L),
      (2L, 4L, 3L, 5L, 600000000L)))
  }

  test("prefixJaccardPairs equals the unpruned all-pairs scan (prefix filter loses nothing)") {
    // Deterministic corpus: overlapping token windows from a fixed word
    // wheel — plenty of near-dup structure, no RNG.
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    val docs = (0 until 40)
      .map(i => (i.toLong, (0 until 8).map(j => words((i / 3 + j) % words.size)).mkString(" ")))
      .toDF("id", "text")
    val fast = Dedup.prefixJaccardPairs(docs, col("id"), col("text"), n = 2, tNum = 2, tDen = 5)
      .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
    // Reference: full quadratic scan over the same shingle sets
    val sets = docs.select(col("id"),
      graft.functions.TextFunctions.wordShingles(col("text"), 2).as("sh"))
    val brute = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_common"),
        (size(col("a.sh")) + size(col("b.sh"))
          - size(array_intersect(col("a.sh"), col("b.sh")))).cast("long").as("n_union"))
      .filter(col("n_common") * 5L >= col("n_union") * 2L)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
        expr("(n_common * 1000000000L) div n_union").as("jacc_n9"))
      .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
    assert(brute.nonEmpty, "degenerate fixture: brute force found no pairs")
    assert(fast == brute)

    // second threshold (4/5): shorter prefixes, harsher prune — the
    // theorem must still lose nothing
    val fastHi = Dedup.prefixJaccardPairs(docs, col("id"), col("text"), n = 2, tNum = 4, tDen = 5)
      .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
    val bruteHi = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_common"),
        (size(col("a.sh")) + size(col("b.sh"))
          - size(array_intersect(col("a.sh"), col("b.sh")))).cast("long").as("n_union"))
      .filter(col("n_common") * 5L >= col("n_union") * 4L)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
        expr("(n_common * 1000000000L) div n_union").as("jacc_n9"))
      .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
    assert(bruteHi.nonEmpty && fastHi == bruteHi)
  }

  test("prefixJaccardPairs equals brute force on seeded random corpora (property-style)") {
    // seeded randomized corpora: docs built from a small phrase pool so
    // near-dup structure is dense and thresholds actually bite
    for (seed <- Seq(7, 41, 1009); (tn, td) <- Seq((1, 3), (3, 5))) {
      val rnd = new scala.util.Random(seed)
      val pool = Vector("red fox", "lazy dog", "spark plan", "shuffle key",
        "broadcast join", "column prune", "codegen stage", "range scan")
      val docs = (0 until 25)
        .map(i => (i.toLong,
          (0 until 3 + rnd.nextInt(5)).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")))
        .toDF("id", "text")
      val fast = Dedup.prefixJaccardPairs(docs, col("id"), col("text"), 2, tn, td)
        .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
      val sets = docs.select(col("id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 2).as("sh"))
      val brute = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("n_common"),
          (size(col("a.sh")) + size(col("b.sh"))
            - size(array_intersect(col("a.sh"), col("b.sh")))).cast("long").as("n_union"))
        .filter(col("n_common") * td.toLong >= col("n_union") * tn.toLong)
        .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
          expr("(n_common * 1000000000L) div n_union").as("jacc_n9"))
        .orderBy(col("id_a"), col("id_b")).collect().map(_.toSeq).toSeq
      assert(fast == brute, s"seed=$seed t=$tn/$td")
      assert(brute.nonEmpty, s"degenerate corpus at seed=$seed t=$tn/$td")
    }
  }

  test("knnSimilarDocs ranks symmetric neighbours with deterministic tie-break") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "x y z"),
      (4L, "a b c d"),
    ).toDF("id", "text")
    // pairs >= 1/2: 1<->2 (3/5), 1<->4 (1), 2<->4 (3/5); doc 3 isolated
    val got = Dedup.knnSimilarDocs(docs, col("id"), col("text"),
        n = 1, k = 2, floorNum = 1, floorDen = 2)
      .orderBy(col("doc_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 4L, 1000000000L, 1L), (1L, 2L, 600000000L, 2L),
      (2L, 1L, 600000000L, 1L), (2L, 4L, 600000000L, 2L), // tie -> nbr asc
      (4L, 1L, 1000000000L, 1L), (4L, 2L, 600000000L, 2L)))
  }

  test("paretoFrontier keeps non-dominated rows and ALL ties, drops dominated ones") {
    val rows = Seq(
      (1L, 10L, 5L), // frontier
      (2L, 10L, 5L), // exact tie with 1 — both survive
      (3L, 10L, 6L), // dominated by 1 (same d, worse n)
      (4L, 12L, 7L), // frontier (best d)
      (5L, 12L, 7L), // tie with 4
      (6L, 11L, 7L), // dominated by 4 (worse d, same n)
      (7L, 8L, 4L), //  frontier (cheapest n)
      (8L, 8L, 5L), //  dominated by 1 (worse d, same n)
    ).toDF("id", "d", "n")
    val got = Curation.paretoFrontier(rows, col("id"), col("d"), col("n"))
      .orderBy(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 4L, 5L, 7L))
  }

  test("decontaminateSpans reports maximal leaked ranges with 0-based offsets") {
    val corpus = Seq(
      (1L, "p q r a b c d e f s t"), // one 6-token leak at offsets 3..8
      (2L, "totally clean text here"), //            no leak -> no rows
      (3L, "a b c x x x x d e f"), //   two separated 3-token leaks
    ).toDF("id", "text")
    val bench = Seq((9L, "a b c d e f")).toDF("id", "text")
    val got = Curation.decontaminateSpans(
        corpus, col("id"), col("text"), bench, col("text"), k = 3)
      .orderBy(col("id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 3, 8, 6, 4L), // windows at 3,4,5,6 merge (adjacency within k)
      (3L, 0, 2, 3, 1L),
      (3L, 7, 9, 3, 1L)))
  }

  test("rollingActiveUsers counts each user once per trailing window") {
    // width 10 s, window 3 buckets; user 1 active in buckets 0 and 2,
    // user 2 in bucket 1 only
    val evs = Seq(
      (1L, 5L), (1L, 25L), (1L, 27L), // buckets 0, 2, 2
      (2L, 15L), //                      bucket 1
    ).toDF("user_id", "sec").select(col("user_id"),
      timestamp_seconds(col("sec")).as("ts"))
    val got = graft.operators.TimeSeries.rollingActiveUsers(
        evs, col("user_id"), col("ts"), widthSeconds = 10L, windowBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // window ends 0..4: [0]={u1}, [1]={u1,u2}, [2]={u1,u2}, [3]={u1,u2}, [4]={u1}
    assert(got == Seq((0L, 1L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("monotonicityAudit cuts equal-population bands and flags rate drops") {
    val rows = Seq(
      (1L, true), (2L, true), (3L, false), (4L, false),
    ).toDF("score", "label")
    val got = graft.operators.DataQuality.monotonicityAudit(
        rows, col("score"), col("label"), buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    // low band all-positive, high band all-negative -> a violation
    assert(got == Seq(
      (0L, 2L, 2L, 1000000000L, false),
      (1L, 2L, 0L, 0L, true)))
  }

  test("percentileNormalize gives tied scores one shared exact percentile") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 40L),
      (5L, "b", 7L), // singleton group -> pct 1e9
    ).toDF("id", "src", "score")
    val got = Curation.percentileNormalize(rows, col("src"), col("score"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 250000000L), (2L, 750000000L), (3L, 750000000L),
      (4L, 1000000000L), (5L, 1000000000L)))
  }

  test("paretoFrontier matches the quadratic NOT-EXISTS dominance scan") {
    // staircase-ish deterministic grid with collisions
    val rows = (0 until 60)
      .map(i => (i.toLong, ((i * 7) % 13).toLong, ((i * 5) % 11 + i % 3).toLong))
      .toDF("id", "d", "n")
    val fast = Curation.paretoFrontier(rows, col("id"), col("d"), col("n"))
      .orderBy(col("id")).collect().map(_.getLong(0)).toSeq
    val brute = rows.as("t").join(rows.as("o"),
        col("o.d") >= col("t.d") && col("o.n") <= col("t.n") &&
          (col("o.d") > col("t.d") || col("o.n") < col("t.n")), "left_anti")
      .orderBy(col("id")).collect().map(_.getLong(0)).toSeq
    assert(brute.nonEmpty && fast == brute)
  }
}
