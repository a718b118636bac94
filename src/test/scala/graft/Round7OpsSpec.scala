package graft

import graft.operators.{DataQuality, Search, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator additions: Cohen's kappa, per-group label balance,
  * ranked-retrieval metrics (MRR / recall@k / nDCG@k), and the
  * matryoshka-prefix ANN funnel. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- Cohen's kappa ---

  test("kappa: hand-computed 2x2 agreement") {
    val df = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))).toDF("a", "b")
    val r = DataQuality.cohenKappa(df, col("a"), col("b")).collect().head
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("agree") == 35L)
    val po = 35.0 / 50.0
    val pe = 1250.0 / 2500.0 // rt: x=25,y=25; ct: x=30,y=20
    assert(r.getAs[Double]("po") == po && r.getAs[Double]("pe") == pe)
    assert(r.getAs[Double]("kappa") == (po - pe) / (1.0 - pe))
  }

  test("kappa: perfect agreement is 1; single-level input is NULL (pe=1)") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(DataQuality.cohenKappa(perfect, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa") == 1.0)
    val degenerate = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = DataQuality.cohenKappa(degenerate, col("a"), col("b")).collect().head
    assert(r.getAs[Double]("pe") == 1.0 && r.isNullAt(r.fieldIndex("kappa")))
  }

  test("kappa: NULL is a real level on both sides; layout-invariant") {
    val df = Seq(("x", Some("x")), ("x", None), (null, null), ("y", Some("y")))
      .toDF("a", "b")
    val r = DataQuality.cohenKappa(df, col("a"), col("b")).collect().head
    // agreements: (x,x), (null,null), (y,y) — the null pair agrees null-safely
    assert(r.getAs[Long]("agree") == 3L && r.getAs[Long]("n") == 4L)
    val one = DataQuality.cohenKappa(df.coalesce(1), col("a"), col("b")).collect().toSeq
    val many = DataQuality.cohenKappa(df.repartition(5), col("a"), col("b")).collect().toSeq
    assert(one == many)
  }

  // --- label balance ---

  test("label balance: uniform two-label group vs single-label group") {
    val df = (Seq.fill(10)(("g1", "en")) ++ Seq.fill(10)(("g1", "de")) ++
      Seq.fill(7)(("g2", "en"))).toDF("src", "lang")
    val rows = DataQuality.labelBalance(df, col("src"), col("lang"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Long]("n_labels"),
        r.getAs[Long]("entropy_n9"),
        r.getAs[Long]("gini_n9"))).toSeq
    assert(rows.map(t => (t._1, t._2, t._3)) == Seq(("g1", 20L, 2L), ("g2", 7L, 1L)))
    // uniform 2 labels: entropy = 2·round(0.5·ln 2·10⁹) nanos,
    // gini = 10⁹ − 2·round(0.25·10⁹)
    assert(rows(0)._4 == 693147180L)
    assert(rows(0)._5 == 500000000L)
    // degenerate single label: entropy 0 (−1·ln 1), gini 0 (1 − 1)
    assert(rows(1)._4 == 0L && rows(1)._5 == 0L)
  }

  test("label balance: NULL labels and NULL groups are real levels") {
    val df = Seq(("g", "en"), ("g", null), (null, "de")).toDF("src", "lang")
    val rows = DataQuality.labelBalance(df, col("src"), col("lang")).collect()
    assert(rows.length == 2) // groups: "g" and NULL
    assert(rows.map(_.getAs[Long]("n_labels")).toSet == Set(2L, 1L))
  }

  // --- retrieval metrics ---

  test("retrieval metrics: hits, misses, idcg cap, and the unjudged query") {
    val out = SparkEntry.queries("txt_retrieval_metrics_fx")(spark, "")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_rel"),
        r.getAs[Long]("hits_k"), r.getAs[Double]("mrr"), r.getAs[Double]("recall_k"),
        r.getAs[Long]("dcg_n9"), r.getAs[Long]("idcg_n9"),
        r.getAs[Long]("ndcg_fp"))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L)) // query 4 is unjudged: absent
    val g2 = 630929754L // round(10⁹/log2(3))
    val one = 1000000000L
    // q1: hit at rank 2 of 2 relevant
    assert(out(0)._3 == 1L && out(0)._4 == 0.5 && out(0)._5 == 0.5)
    assert(out(0)._6 == g2 && out(0)._7 == one + g2)
    // q2: judged, retriever returned nothing — zeros, idcg = g(1)
    assert(out(1) == ((2L, 1L, 0L, 0.0, 0.0, 0L, one, 0L)))
    // q3: hits at ranks 1,2; n_rel=4 but idcg caps at k=3 ranks
    assert(out(2)._3 == 2L && out(2)._4 == 1.0 && out(2)._5 == 0.5)
    assert(out(2)._6 == one + g2)
    assert(out(2)._7 == one + g2 + 500000000L)
    // ndcg_fp is the exact integer-division fixed point of the nano sums
    assert(out(2)._8 == ((one + g2) * 1000000L) / (one + g2 + 500000000L))
  }

  test("retrieval metrics: validation and rank>k run rows never count") {
    val runs = Seq((1L, 10L, 5L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L)).toDF("query_id", "doc_id")
    val r = Search.retrievalMetrics(runs, qrels, k = 3).collect().head
    assert(r.getAs[Long]("hits_k") == 0L && r.getAs[Double]("mrr") == 0.0)
    intercept[IllegalArgumentException] { Search.retrievalMetrics(runs, qrels, 0) }
  }

  // --- Spearman rank correlation ---

  test("rank correlation: identity is 1, reversal is -1, intersection-only") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L)).toDF("id", "rank")
    val rev = Seq((10L, 4L), (11L, 3L), (12L, 2L), (13L, 1L)).toDF("id", "rank")
    assert(Search.rankCorrelation(a, a, "id").collect().head.getAs[Double]("rho") == 1.0)
    val r = Search.rankCorrelation(a, rev, "id").collect().head
    assert(r.getAs[Long]("sum_d2") == 20L && r.getAs[Double]("rho") == -1.0)
    // only shared ids count, re-ranked densely within the intersection
    val partial = Seq((11L, 1L), (13L, 2L), (99L, 3L)).toDF("id", "rank")
    val p = Search.rankCorrelation(a, partial, "id").collect().head
    assert(p.getAs[Long]("n") == 2L && p.getAs[Double]("rho") == 1.0)
    // n < 2: undefined
    val single = Seq((10L, 1L)).toDF("id", "rank")
    val s1 = Search.rankCorrelation(a, single, "id").collect().head
    assert(s1.isNullAt(s1.fieldIndex("rho")))
  }

  // --- classification report ---

  test("classification report: per-class P/R/F1, union class set, NULL where undefined") {
    val df = (Seq.fill(8)(("en", "en")) ++ Seq.fill(2)(("en", "de")) ++
      Seq.fill(5)(("de", "de")) ++ Seq.fill(1)(("de", "fr"))).toDF("a", "p")
    val rows = DataQuality.classificationReport(df, col("a"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("en", "de", "fr"))
    val en = rows("en")
    assert(en.getAs[Long]("support") == 10L && en.getAs[Long]("n_pred") == 8L
      && en.getAs[Long]("tp") == 8L)
    assert(en.getAs[Double]("precision") == 1.0 && en.getAs[Double]("recall") == 0.8)
    assert(en.getAs[Double]("f1") == 2.0 * 1.0 * 0.8 / 1.8)
    // fr was never an actual label: support 0, recall NULL, f1 NULL
    val fr = rows("fr")
    assert(fr.getAs[Long]("support") == 0L && fr.getAs[Long]("n_pred") == 1L
      && fr.getAs[Long]("tp") == 0L)
    assert(fr.isNullAt(fr.fieldIndex("recall")) && fr.isNullAt(fr.fieldIndex("f1")))
    assert(fr.getAs[Double]("precision") == 0.0)
  }

  // --- group shingle overlap ---

  test("group overlap: asymmetric containment over distinct shingle sets") {
    val docs = Seq(
      ("a", "w x y z"),      // shingles: {w x y, x y z}
      ("a", "w x y"),        // duplicate shingle within the group: distinct
      ("b", "w x y q"),      // shares {w x y} with a; adds {x y q}
      ("c", "p q r"),        // disjoint
    ).toDF("src", "text")
    val rows = graft.operators.Dedup
      .groupShingleOverlap(docs, col("src"), col("text"), 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_common"), r.getAs[Double]("containment"))))
      .toMap
    // a has 2 distinct shingles, b has 2; they share exactly 1
    assert(rows(("a", "b")) == ((2L, 1L, 0.5)))
    assert(rows(("b", "a")) == ((2L, 1L, 0.5)))
    assert(!rows.contains(("a", "c"))) // disjoint pairs emit nothing
  }

  // --- NFC normalization kernel ---

  test("nfc kernel: composes decomposed sequences, identity on ascii/NFC text") {
    import graft.functions.TextFunctions
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = Seq(
      (1L, "Café"), (2L, "Café"), (3L, "ascii only"),
      (4L, "Å"), (5L, "Å"), (6L, null.asInstanceOf[String]),
    ).toDF("id", "text")
    val got = rows.select(col("id"), TextFunctions.nfcNormalize(col("text")).as("n"))
      .orderBy(col("id")).collect().map(r => Option(r.getString(1))).toSeq
    // reference: java.text.Normalizer on the same inputs
    assert(got == Seq(Some("Café"), Some("Café"), Some("ascii only"),
      Some("Å"), Some("Å"), None))
    // normalized twins now hash-collide — the dedup motivation
    val fps = rows.filter(col("id") <= 2)
      .select(md5(TextFunctions.nfcNormalize(col("text")))).distinct().count()
    assert(fps == 1L)
  }

  test("nfc kernel: stays inside whole-stage codegen") {
    import graft.functions.TextFunctions
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.range(10).select(
      TextFunctions.nfcNormalize(concat(lit("x́"), col("id"))).as("n"))
    val codegenned = df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.isDefined, df.queryExecution.executedPlan.toString)
    assert(df.distinct().count() == 10)
  }

  // --- perceptual (aHash) near-dup ---

  test("aHash near-dup: identical and thumbnail payloads pair at hamming 0") {
    import graft.operators.Multimodal
    val orig = "the quick brown fox jumps over the lazy dog " * 8
    val media = Seq(
      (1L, orig.getBytes("UTF-8")),
      (2L, Multimodal.byteResample(orig.getBytes("UTF-8"), 16, 8)), // thumbnail
      (3L, ("completely different payload bytes zzzz " * 9).getBytes("UTF-8")),
      (4L, Array.emptyByteArray), // empty: dropped, never pairs
    ).toDF("id", "payload")
    val pairs = Multimodal.aHashNearDupPairs(media, col("id"), col("payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSeq
    // resampling commutes with block sampling: the thumbnail IS the original
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
    intercept[IllegalArgumentException] {
      Multimodal.aHashNearDupPairs(media, col("id"), col("payload"), maxHamming = 65)
    }
  }

  test("aHash signatures: bands are 16-bit, deterministic, layout-invariant") {
    import graft.operators.Multimodal
    val media = (1L to 30L)
      .map(i => (i, (s"payload number $i with some shared structure " * 6).getBytes("UTF-8")))
      .toDF("id", "payload")
    val one = Multimodal.aHashSignatures(media.coalesce(1), col("id"), col("payload"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val many = Multimodal.aHashSignatures(media.repartition(7), col("id"), col("payload"))
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    assert(one == many)
    assert(one.forall(r => (2 to 5).forall(i =>
      r(i).asInstanceOf[Long] >= 0L && r(i).asInstanceOf[Long] <= 0xFFFFL)))
  }

  // --- matryoshka funnel ---

  test("matryoshka: full-width prefix with oversample 1 equals brute force") {
    val vecs = (1L to 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 4f))
    }.toDF("id", "vec")
    val q = vecs.filter(col("id") < 4)
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .select("query_id", "neighbor_id", "cosine", "rank").collect().map(_.toSeq).toSet
    val mt = Similarity.matryoshkaTopK(vecs, q, 5, prefixDims = 8, oversample = 1)
      .select("query_id", "neighbor_id", "cosine", "rank").collect().map(_.toSeq).toSet
    assert(mt == bf)
  }

  test("matryoshka: a too-small oversample misses what a wider funnel finds") {
    // prefix dim 1: every positive-x candidate has prefix cosine 1.0 for a
    // positive-x query, so stage-1 ties break purely by id — candidate id 2
    // survives with oversample 1 even though id 3 has the better full cosine
    val corpus = Seq(
      (2L, Array(1.0f, -1.0f)), // prefix ties at 1.0, full cosine 0
      (3L, Array(1.0f, 1.0f)),  // full cosine 1 — the true neighbor
    ).toDF("id", "vec")
    val q = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "vec")
    val narrow = Similarity.matryoshkaTopK(corpus, q, k = 1, prefixDims = 1, oversample = 1)
      .collect().head
    assert(narrow.getAs[Long]("neighbor_id") == 2L)
    val wide = Similarity.matryoshkaTopK(corpus, q, k = 1, prefixDims = 1, oversample = 2)
      .collect().head
    assert(wide.getAs[Long]("neighbor_id") == 3L)
    assert(wide.getAs[Double]("cosine") > 0.999) // sqrt norms leave an ulp
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(corpus, q, 1, prefixDims = 0)
    }
  }
}
