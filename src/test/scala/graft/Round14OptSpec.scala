package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Round-14 OPTIMIZATION kernels: the native gram-window generator
  * ([[graft.functions.WordGramsExpr]]) and the clipped n-gram overlap
  * kernel ([[graft.functions.GramOverlapExpr]]) must be value-identical
  * to the higher-order-function forms they replaced — these specs pin
  * that parity property-style over random token arrays, plus the edge
  * cases the rewrites must preserve (short docs, empty docs, NULL
  * arrays, null elements, multiplicity). */
class Round14OptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofGrams(t: org.apache.spark.sql.Column, n: Int) =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  private val tokGen: Gen[Seq[String]] =
    Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "ab", "xyz", "q1", "b")))

  test("WordGramsExpr == transform/slice/concat_ws HOF form (property)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = Gen.listOfN(60, tokGen).sample.get ++
      Seq(Seq.empty[String], Seq("one"), Seq("a", "a", "a", "a"))
    for (n <- Seq(1, 2, 3, 5)) {
      val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"),
        graft.functions.WordGramsExpr.gramsCol(col("t"), n).as("g"))
        .orderBy(col("id")).collect().map(_.getSeq[String](1))
      val want = df.select(col("id"), hofGrams(col("t"), n).as("g"))
        .orderBy(col("id")).collect().map(_.getSeq[String](1))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
  }

  test("WordGramsExpr: NULL tokens yield NULL; null elements skip like concat_ws") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(
      "SELECT graft_word_grams(CAST(NULL AS ARRAY<STRING>), 2) AS a, " +
        "graft_word_grams(array('x', CAST(NULL AS STRING), 'y'), 2) AS b")
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    // windows: (x, null) -> "x", (null, y) -> "y"  (concat_ws skips nulls)
    assert(r.getSeq[String](1) == Seq("x", "y"))
  }

  test("GramOverlapExpr == exploded clipped-count form (property)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def grams(t: Seq[String], n: Int): Seq[String] =
      if (t.length >= n) t.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
    def clip(c: Seq[String], r: Seq[String], n: Int): (Long, Long, Long) = {
      val cg = grams(c, n); val rg = grams(r, n)
      val overlap = cg.groupBy(identity).map { case (g, occ) =>
        math.min(occ.size, rg.count(_ == g))
      }.sum
      (cg.size.toLong, rg.size.toLong, overlap.toLong)
    }
    val pairs = Gen.listOfN(80, Gen.zip(tokGen, tokGen)).sample.get ++
      Seq((Seq.empty[String], Seq("a", "b")), (Seq("a"), Seq.empty[String]),
        (Seq("a", "b", "a", "b", "a"), Seq("a", "b", "a")))
    for (n <- Seq(1, 2, 3)) {
      val df = pairs.zipWithIndex.map { case ((c, r), i) => (i.toLong, c, r) }
        .toDF("id", "c", "r")
      val got = df.select(col("id"),
        graft.functions.GramOverlapExpr.overlapCol(col("c"), col("r"), n).as("g"))
        .orderBy(col("id")).collect()
        .map(x => { val s = x.getStruct(1); (s.getLong(0), s.getLong(1), s.getLong(2)) })
      val want = pairs.map { case (c, r) => clip(c, r, n) }
      assert(got.toSeq == want, s"n=$n")
    }
  }

  test("GramOverlapExpr: NULL on either side yields NULL struct") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_gram_overlap(CAST(NULL AS ARRAY<STRING>), array('a'), 1) AS a, " +
        "graft_gram_overlap(array('a'), CAST(NULL AS ARRAY<STRING>), 1) AS b").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("crossScoredTopK agg path matches the window form's rank cut") {
    // 40 vectors, k=3: the aggregate cut must equal the row_number cut
    // (cosine desc, neighbor_id asc) row for row.
    val e = spark.range(40).select(col("id"),
      transform(sequence(lit(0), lit(7)), i =>
        (pmod(col("id") * (i + lit(3)) + i * i, lit(17)).cast("double") - lit(8.0)))
        .as("vec"))
    val got = graft.operators.Similarity.bruteForceTopK(e, e, 3)
      .orderBy(col("query_id"), col("rank")).collect()
    // reference: brute-force in Scala
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      val c = if (na * nb > 0.0) dot / (na * nb) else 0.0
      if (c.isNaN || c.isInfinite) None else Some(c)
    }
    val want = vecs.keys.toSeq.sorted.flatMap { q =>
      vecs.keys.toSeq.filter(_ != q)
        .flatMap(nid => cos(vecs(q), vecs(nid)).map(c => (q, nid, c)))
        .sortBy { case (_, nid, c) => (-c, nid) }
        .take(3).zipWithIndex
        .map { case ((qq, nid, c), i) => (qq, nid, c, i + 1) }
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (row, (q, nid, c, rk)) =>
      assert(row.getLong(0) == q && row.getLong(1) == nid && row.getInt(3) == rk)
      assert(math.abs(row.getDouble(2) - c) < 1e-12)
    }
  }
}
