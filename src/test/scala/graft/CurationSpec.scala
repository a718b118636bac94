package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags exactly the documents sharing a benchmark shingle") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark plans"),
      (3L, "another quick brown fox appears here"),
    ).toDF("id", "text")
    val benchmark = Seq(
      (100L, "watch the quick brown fox run"),
    ).toDF("id", "text")

    val got = Curation.decontaminate(corpus, benchmark, n = 3)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // doc 1 shares "the quick brown" and "quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing
    assert(got == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("decontaminate keeps one row per document even with repeated shingles") {
    // wordShingles is distinct per doc: a doc repeating the benchmark
    // trigram counts it once
    val corpus = Seq((1L, "a b c x a b c")).toDF("id", "text")
    val benchmark = Seq((9L, "a b c")).toDF("id", "text")
    val got = Curation.decontaminate(corpus, benchmark, n = 3).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
  }

  test("fuzzy decontaminate flags identical and paraphrased docs, not unrelated ones") {
    val bench = Seq(
      (100L, "what is the boiling point of water at sea level pressure"),
    ).toDF("id", "text")
    val corpus = Seq(
      // identical to the benchmark doc -> est jaccard 1.0
      (1L, "what is the boiling point of water at sea level pressure"),
      // light edit (one trailing word): 8 of 10 distinct shingles shared
      // -> high jaccard; 8 bands x 2 rows gives ~j^2 collision per band
      (2L, "what is the boiling point of water at sea level pressures"),
      // unrelated -> no band collision, 0.0
      (3L, "spark plans broadcast small dimension tables for join locality"),
    ).toDF("id", "text")
    val got = Curation.fuzzyDecontaminate(corpus, bench,
      shingleN = 3, numHashes = 16, numBands = 8, threshold = 0.5)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._2 == 1.0 && got(0)._3, got.toString) // identical
    assert(got(1)._2 >= 0.5 && got(1)._3, got.toString) // light edit caught
    assert(got(2)._2 == 0.0 && !got(2)._3, got.toString) // unrelated clean
    // the exact-shingle gate misses nothing here, but the phrase-swapped
    // variant below is caught ONLY by the fuzzy path (zero shared
    // 8-grams, high 3-shingle jaccard is the contaminated signal)
    val swapped = Seq(
      (9L, "at sea level pressure what is the boiling point of water"),
    ).toDF("id", "text")
    val fuzzy = Curation.fuzzyDecontaminate(swapped, bench,
      shingleN = 3, numHashes = 16, numBands = 8, threshold = 0.4)
      .collect().head
    val exact = Curation.decontaminate(swapped, bench, n = 8).collect().head
    assert(fuzzy.getBoolean(2), fuzzy.toString)
    assert(!exact.getBoolean(2), exact.toString)
  }

  test("sequence packing: greedy keep-whole bins, oversized docs, shard resets") {
    // single shard so id order is the full packing order
    val docs = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 11L), (5L, 1L), (6L, 9L), (7L, 1L))
      .toDF("id", "tok")
    val got = Curation.packSequences(docs, col("id"), col("tok"),
      tokenBudget = 10, numShards = 1)
      .orderBy(col("id")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("pack"))).toSeq
    // 6 -> p0 ; 6 (6+6>10) -> p1 ; 6 -> p2 ; 11 oversized -> p3 alone ;
    // 1 (11+1>10) -> p4 ; 9 (1+9=10 fits) -> p4 ; 1 (10+1>10) -> p5
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L), (6L, 4L), (7L, 5L)))
    // every pack except oversized singletons respects the budget
    val sums = Curation.packSequences(docs, col("id"), col("tok"), 10, 1)
      .groupBy(col("pack")).agg(sum(col("tok")).as("s"), count(lit(1)).as("n")).collect()
    sums.foreach(r => assert(r.getAs[Long]("s") <= 10 || r.getAs[Long]("n") == 1))
    // sharded run is deterministic
    val big = (1L to 500L).map(i => (i, (i % 7) + 1)).toDF("id", "tok")
    val a = Curation.packSequences(big, col("id"), col("tok"), 16, numShards = 8)
      .select(col("id"), col("shard"), col("pack")).collect().map(_.toSeq).sortBy(_.toString)
    val b = Curation.packSequences(big, col("id"), col("tok"), 16, numShards = 8)
      .select(col("id"), col("shard"), col("pack")).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("stratified sample is deterministic, honors per-stratum fractions, and filters only") {
    val docs = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val sample = Curation.stratifiedSample(
      docs, col("lang"), col("id"), Map("en" -> 0.5, "de" -> 0.1))
    val a = sample.collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.stratifiedSample(
      docs, col("lang"), col("id"), Map("en" -> 0.5, "de" -> 0.1))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b) // bit-reproducible
    val byLang = sample.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 uniform: expected 1000 en, 200 de; allow generous tolerance
    assert(byLang("en") > 800 && byLang("en") < 1200, byLang)
    assert(byLang("de") > 120 && byLang("de") < 280, byLang)
    // unknown strata fall to defaultFraction = 0.0 -> dropped entirely
    val other = (1L to 100L).map(i => (i, "zz")).toDF("id", "lang")
    assert(Curation.stratifiedSample(other, col("lang"), col("id"), Map("en" -> 1.0))
      .count() == 0L)
    // plan is a pure filter: no exchange anywhere
    assert(!sample.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("mixture plan: keep_frac math, 1.0 cap, zero/absent weights and degenerate totals drop") {
    val docs = Seq(
      ("a", 1L, 400L), ("a", 2L, 600L),    // total 1000, weight 0.5 -> 500/1000 = 0.5
      ("b", 3L, 50L),                       // total 50, weight 0.3 -> 300/50 -> capped 1.0
      ("c", 4L, 100L),                      // weight 0.0 explicit -> 0.0
      ("d", 5L, 100L),                      // absent from weights -> 0.0
      ("e", 6L, 0L), ("e", 7L, 0L),         // total 0, weight 0.2 -> guarded 0.0 (0/0 NaN trap)
    ).toDF("source", "id", "tok")
    val plan = Curation.mixturePlan(docs, col("source"), col("tok"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.0, "e" -> 0.2), tokenBudget = 1000L)
      .orderBy(col("source")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("keep_frac")).toMap
    assert(plan("a") == 0.5)
    assert(plan("b") == 1.0)
    assert(plan("c") == 0.0)
    assert(plan("d") == 0.0)
    assert(plan("e") == 0.0)
  }

  test("mixture plan: all-null token counts yield keep_frac 0.0, not 1.0") {
    val docs = Seq(("a", 1L), ("a", 2L)).toDF("source", "id")
      .withColumn("tok", lit(null).cast("long"))
    val plan = Curation.mixturePlan(docs, col("source"), col("tok"),
      Map("a" -> 1.0), tokenBudget = 1000L).collect()
    assert(plan.length == 1 && plan.head.getAs[Double]("keep_frac") == 0.0)
  }

  test("mixture sample: deterministic across partitionings, drops unweighted and null sources") {
    val docs = (1L to 4000L).map { i =>
      val src = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "zz"
      (if (i % 100 == 0) null else src, i, 10L)
    }.toDF("source", "id", "tok")
    val weights = Map("a" -> 0.7, "b" -> 0.3)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Curation.mixtureSample(df, col("source"), col("id"), col("tok"),
        weights, tokenBudget = 8000L).collect().map(_.getAs[Long]("id")).sorted.toSeq
    val a = ids(docs)
    val b = ids(docs.repartition(7, col("id")))
    assert(a == b) // bit-reproducible regardless of layout
    val kept = Curation.mixtureSample(docs, col("source"), col("id"), col("tok"),
      weights, tokenBudget = 8000L)
    // unweighted source and null source contribute nothing
    assert(kept.filter(col("source") === "zz" || col("source").isNull).count() == 0L)
    // expected token yield per source ~ budget * weight (md5-uniform tolerance)
    val byCnt = kept.groupBy(col("source")).agg(sum(col("tok")).as("t")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("t")).toMap
    assert(byCnt("a") > 4200 && byCnt("a") < 7000, byCnt)  // target 5600
    assert(byCnt("b") > 1500 && byCnt("b") < 3400, byCnt)  // target 2400
    // a source smaller than its share keeps every row (cap at 1.0)
    val tiny = Seq(("a", 1L, 5L), ("a", 2L, 5L)).toDF("source", "id", "tok")
    assert(Curation.mixtureSample(tiny, col("source"), col("id"), col("tok"),
      Map("a" -> 1.0), tokenBudget = 1000L).count() == 2L)
  }

  test("chunking: overlapping windows, short docs, trailing partial chunk") {
    val docs = Seq(
      (1L, "a b c d e f g"),      // 7 toks, cs=3 ov=1 -> [a b c][c d e][e f g]
      (2L, "x y"),                // shorter than one window -> single chunk
      (3L, "p q r s t u v w"),    // 8 toks -> 4 chunks, last is 2 toks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, col("doc_id"), col("text"),
      chunkSize = 3, overlap = 1)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, 0L, "a b c", 3), (1L, 1L, "c d e", 3), (1L, 2L, "e f g", 3),
      (2L, 0L, "x y", 2),
      (3L, 0L, "p q r", 3), (3L, 1L, "r s t", 3), (3L, 2L, "t u v", 3), (3L, 3L, "v w", 2),
    ))
    // no overlap: clean partition of the token stream
    val flat = Curation.chunkDocuments(docs.filter(col("doc_id") === 1), col("doc_id"),
      col("text"), chunkSize = 4)
      .orderBy(col("chunk_id")).collect().map(_.getString(2)).toSeq
    assert(flat == Seq("a b c d", "e f g"))
    // pure projection + explode: no exchange in the plan
    val plan = Curation.chunkDocuments(docs, col("doc_id"), col("text"), 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("epoch shuffle: exact permutation, reproducible, epochs independent") {
    val docs = (1L to 1000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    def order(df: org.apache.spark.sql.DataFrame, epoch: Int): Seq[Long] =
      Curation.epochShuffle(df, col("doc_id"), epoch)
        .orderBy(col("shuffle_pos")).collect().map(_.getLong(0)).toSeq
    val e1 = order(docs, 1)
    assert(e1.sorted == (1L to 1000L)) // a true permutation, positions dense
    assert(e1 == order(docs.repartition(13), 1)) // layout-independent
    val e2 = order(docs, 2)
    assert(e1 != e2) // epochs decorrelated
    assert(e2.sorted == (1L to 1000L))
  }

  test("PII redaction: typed placeholders, IP never eaten by the phone pattern") {
    val docs = Seq(
      (1L, "write to jane.doe+spam@sub.example.org today"),
      (2L, "server at 192.168.001.042 answered"),
      (3L, "call +44 (0) 2079-460000 now"),
      (4L, "mixed a@b.io then 10.0.0.1 then (555) 010-0042 end"),
      (5L, "clean text with the number 7 alone"),
    ).toDF("id", "text")
    val got = docs.select(col("id"), Curation.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "write to <EMAIL> today")
    assert(got(2L) == "server at <IP> answered")
    assert(got(3L) == "call <PHONE> now")
    assert(got(4L) == "mixed <EMAIL> then <IP> then <PHONE> end")
    assert(got(5L) == "clean text with the number 7 alone")
  }

  test("samplePerGroup: exactly k per group, deterministic across partitionings") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val s1 = Curation.samplePerGroup(df, Seq(col("g")), col("id"), k = 4)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(s1.groupBy(_._1).forall(_._2.size == 4))
    val s2 = Curation.samplePerGroup(df.repartition(11), Seq(col("g")), col("id"), k = 4)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(s2 == s1)
    // undersized group: returned whole
    val tiny = Seq(("a", 1L), ("a", 2L)).toDF("g", "id")
    assert(Curation.samplePerGroup(tiny, Seq(col("g")), col("id"), 5).count() == 2L)
  }

  test("snapshot diff: added/removed/changed/unchanged, null content null-safe") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null), (5L, "e"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B!"), (4L, null), (5L, null), (6L, "new"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(v1, v2, "doc_id", md5(col("text")))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("status"))).toSeq
    assert(got == Seq(
      (1L, "unchanged"),
      (2L, "changed"),
      (3L, "removed"),
      (4L, "unchanged"), // null fingerprint on both sides compares null-safely
      (5L, "changed"),   // e -> null content is a change, not a removal
      (6L, "added"),
    ))
  }

  test("pps sample: deterministic, size-weighted, oversize rows kept with weight 1") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "sz")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.ppsSample(d, col("id"), col("sz"), target = 10L)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val one = run(df.coalesce(1))
    assert(one == run(df.repartition(7)))
    // every kept row carries ht_weight = 1/p = total / (target * sz)
    one.foreach { case (id, w) =>
      assert(w == 1.0 / (10.0 * id.toDouble / 5050.0), s"id=$id")
    }
    // a row bigger than total/target has p = 1: always kept, weight exactly 1
    val withWhale = df.union(Seq((999L, 100000L)).toDF("id", "sz"))
    val whale = Curation.ppsSample(withWhale, col("id"), col("sz"), 10L)
      .filter(col("id") === 999L).collect()
    assert(whale.length == 1 && whale.head.getDouble(2) == 1.0)
  }

  test("pps sample: null/zero sizes never kept; all-null sizes give empty output") {
    val df = Seq((1L, Some(0L)), (2L, None), (3L, Some(50L))).toDF("id", "sz")
    val kept = Curation.ppsSample(df, col("id"), col("sz"), 100L)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L)) // p=1 for the only sized row; 0/null excluded
    val empty = Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "sz")
    assert(Curation.ppsSample(empty, col("id"), col("sz"), 10L).count() == 0L)
    intercept[IllegalArgumentException] {
      Curation.ppsSample(df, col("id"), col("sz"), 0L)
    }
  }

  test("curriculum stages: interpolated boundaries, ties to lower stage, NULL score") {
    val df = (1 to 100).map(_.toLong).toDF("s")
      .union(Seq(null.asInstanceOf[java.lang.Long]).toDF("s"))
    val out = Curation.curriculumStages(df, col("s"), nStages = 4)
      .collect().map(r => (Option(r.getAs[java.lang.Long]("s")).map(_.toLong),
        Option(r.getAs[java.lang.Integer]("stage")).map(_.toInt)))
    val stages = out.collect { case (Some(s), st) => s -> st }.toMap
    // thresholds over 1..100: 25.75 / 50.5 / 75.25 (nulls excluded)
    assert(stages(25L).contains(0) && stages(26L).contains(1))
    assert(stages(50L).contains(1) && stages(51L).contains(2))
    assert(stages(75L).contains(2) && stages(76L).contains(3))
    assert(stages(100L).contains(3))
    assert(out.exists { case (s, st) => s.isEmpty && st.isEmpty }) // NULL -> NULL
    // near-equal tiers
    val sizes = out.collect { case (_, Some(st)) => st }
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes == Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
    intercept[IllegalArgumentException] {
      Curation.curriculumStages(df, col("s"), nStages = 1)
    }
  }

  test("temperature mixture: alpha=0 equalizes shares, alpha=1 keeps proportions") {
    val df = ((1 to 90).map(i => (i.toLong, "big", "x" * 100)) ++
      (91 to 100).map(i => (i.toLong, "small", "x" * 100)))
      .toDF("id", "src", "text")
    // alpha=0: every source gets w=1 -> q=0.5 each
    val eq = Curation.temperatureMixturePlan(df, col("src"), length(col("text")),
      alpha = 0.0, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(eq("big") == 0.5 && eq("small") == 0.5)
    // alpha=1: q == corpus share (to the 6-dp weight rounding)
    val prop = Curation.temperatureMixturePlan(df, col("src"), length(col("text")),
      alpha = 1.0, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(prop("big") - 0.9) < 1e-8 && math.abs(prop("small") - 0.1) < 1e-8)
    // alpha=0.5: small source upweighted relative to its share
    val half = Curation.temperatureMixturePlan(df, col("src"), length(col("text")),
      alpha = 0.5, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(half("small") > 0.1 && half("big") < 0.9)
    // sampling is deterministic across partitionings
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.temperatureMixtureSample(d, col("src"), col("id"),
        length(col("text")), 0.5, 1000L)
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(7)))
    intercept[IllegalArgumentException] {
      Curation.temperatureMixturePlan(df, col("src"), length(col("text")), 1.5, 1000L)
    }
  }

  test("negative sampling: exactly k per anchor, never self, deterministic") {
    val df = (1L to 50L).map(i => i * 10).toDF("id") // sparse keys
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.negativeSample(d, col("id"), k = 4)
        .orderBy(col("anchor"), col("neg_rank"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val one = run(df.coalesce(1))
    assert(one == run(df.repartition(7)))
    assert(one.size == 50 * 4)
    assert(one.forall { case (a, _, n) => a != n }) // structurally impossible
    assert(one.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1, 2, 3, 4)))
    // under 2 rows there is nothing to pair with
    assert(Curation.negativeSample(Seq(1L).toDF("id"), col("id"), 3).count() == 0L)
    intercept[IllegalArgumentException] {
      Curation.negativeSample(df, col("id"), k = 0)
    }
  }

  test("curriculum stages: a score exactly ON a boundary goes to the lower stage") {
    // 1..4: thresholds 1.75, 2.5, 3.25; add 2.5 twice so the boundary hits
    val df = Seq(1.0, 2.0, 2.5, 2.5, 3.0, 4.0).toDF("s")
    val out = Curation.curriculumStages(df, col("s"), nStages = 2)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    // median of {1, 2, 2.5, 2.5, 3, 4} = 2.5 -> the 2.5 scores stage 0
    assert(out(2.5) == 0 && out(3.0) == 1)
  }

  test("training-shard plan: dedup-safe, balanced shards, budget-respecting packs") {
    // 40 docs with varying token counts, plus doc 99 an exact duplicate of
    // doc 5's text — an epoch must never pack the same content twice
    // texts are UNIQUE per doc (id-prefixed) except the planted pair —
    // md5-exact dedup would otherwise (correctly) collapse same-length docs
    val base = (1L to 40L).map(i =>
      (i, (Seq(s"d$i") ++ Seq.fill((i % 7).toInt + 1)("w")).mkString(" ")))
    val docs = (base :+ (99L, base(4)._2)).toDF("id", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    def plan(d: org.apache.spark.sql.DataFrame) =
      Curation.trainingShardPlan(d, col("id"), col("text"), tok,
        epoch = 1, tokenBudget = 8, numShards = 4)
    val p = plan(docs)
    val rows = p.collect()
    // dedup: 40 survivors, and the survivor of the duplicate pair is the
    // MIN id (5), never 99
    assert(rows.length == 40)
    assert(!rows.exists(_.getLong(0) == 99L))
    assert(rows.exists(_.getLong(0) == 5L))
    // round-robin shards balance to +-1 by construction
    val perShard = rows.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(perShard.keySet == Set(0, 1, 2, 3))
    assert(perShard.values.max - perShard.values.min <= 1, perShard)
    // every pack respects the budget unless it holds a single oversized doc
    val packs = p.groupBy(col("shard"), col("pack"))
      .agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("n")).collect()
    assert(packs.forall(r => r.getLong(2) <= 8L || r.getLong(3) == 1L))
    // deterministic across partitionings
    val a = rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val b = plan(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b)
    // a different epoch is a different permutation (not necessarily for
    // every doc; at 40 docs a fixed point across ALL of them is ~0)
    val e2 = Curation.trainingShardPlan(docs, col("id"), col("text"), tok,
      epoch = 2, tokenBudget = 8, numShards = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val e1 = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(e1 != e2)
  }

  test("writeTrainingShards: one file per shard, z-laid rows round-trip the plan") {
    val docs = (1L to 60L).map(i =>
      (i, (Seq(s"d$i") ++ Seq.fill((i % 9).toInt + 1)("w")).mkString(" "))).toDF("id", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    val outDir = java.nio.file.Files.createTempDirectory("train_shards").toString + "/epoch1"
    val back = Curation.writeTrainingShards(docs, col("id"), col("text"), tok,
      epoch = 1, tokenBudget = 12, numShards = 4, outDir = outDir)
    val plan = Curation.trainingShardPlan(docs, col("id"), col("text"), tok,
      epoch = 1, tokenBudget = 12, numShards = 4)
    // written data == plan, row for row
    val got = back.select(col("doc_id"), col("shard").cast("int"), col("pack"), col("shuffle_pos"), col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = plan.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want)
    // small-files guard: exactly one parquet file per shard directory
    val shardDirs = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 4, shardDirs.map(_.getName).mkString(","))
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("removeBoilerplateLines: df-threshold scrub preserves order, keeps empty docs") {
    val docs = Seq(
      (1L, "BANNER\nalpha beta\nfooter"),
      (2L, "BANNER\ngamma delta\nfooter"),
      (3L, "BANNER\nepsilon zeta"),
      (4L, "BANNER\nfooter"),
    ).toDF("id", "text")
    // ceil(0.6 * 4) = 3: BANNER (df 4) and footer (df 3) are boilerplate
    val got = Curation.removeBoilerplateLines(docs, col("id"), col("text"), 0.6)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "alpha beta"),
      (2L, 3L, 2L, "gamma delta"),
      (3L, 2L, 1L, "epsilon zeta"),
      (4L, 2L, 2L, "")))
    // a line repeated WITHIN one doc counts that doc once: df of "dup" is
    // 1 of 3 docs < ceil(0.5*3)=2, so it survives (both copies, in order)
    val rep = Seq((1L, "dup\ndup\nx"), (2L, "y"), (3L, "z")).toDF("id", "text")
    val kept = Curation.removeBoilerplateLines(rep, col("id"), col("text"), 0.5)
      .filter(col("id") === 1L).head()
    assert(kept.getString(3) == "dup\ndup\nx", kept.toString)
    // deterministic across partitionings
    val big = (1L to 200L).map(i => (i, s"HEADER\nbody $i\nmid ${i % 5}")).toDF("id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.removeBoilerplateLines(d, col("id"), col("text"), 0.3)
        .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    assert(run(big) == run(big.repartition(7)))
    intercept[IllegalArgumentException] {
      Curation.removeBoilerplateLines(docs, col("id"), col("text"), 0.0)
    }
  }

  test("lengthBuckets: power-of-two ladder, clamp, padding accounting") {
    val df = Seq(10L, 16L, 17L, 100L, 20000L).toDF("n")
    val got = Curation.lengthBuckets(df, col("n"), minLog2 = 4, maxLog2 = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 10,16 -> bucket 16 (padding 6+0); 17 -> 32 (15); 100 -> 128 (28);
    // 20000 clamps to 16384 with zero padding
    assert(got == Seq(
      (16L, 2L, 26L, 6L), (32L, 1L, 17L, 15L),
      (128L, 1L, 100L, 28L), (16384L, 1L, 16384L, 0L)))
    val eff = Curation.lengthBuckets(df, col("n")).filter(col("bucket") === 16L)
      .head().getDouble(4)
    assert(eff == 26.0 / 32.0)
    intercept[IllegalArgumentException] {
      Curation.lengthBuckets(df, col("n"), minLog2 = 5, maxLog2 = 5)
    }
  }

  test("gopherRules: integer-exact flags over hand-built documents") {
    val docs = Seq(
      // clean prose: 12 words, mean len 39/12, stopwords, all-alpha -> pass
      (1L, "the cats sat down on a mat and that was fine today"),
      // symbol-heavy: 10 words + 2 '#' -> 10*2 >= 10 -> ok_symbol false
      (2L, "the cat sat on a mat and that was ##"),
      // bullet-dominated lines (3 of 3) -> ok_bullet false
      (3L, "- the alpha point here now\n- and beta point is that\n- of gamma too"),
      // ellipsis line endings (2 of 3 >= 0.3) -> ok_ellipsis false
      (4L, "the start is here...\nand more of that...\na clean end now"),
      // too few words -> ok_words false
      (5L, "tiny doc"),
      // numeric words: alpha fraction 2/10 < 0.8, no 2 distinct stopwords
      (6L, "1 2 3 4 5 6 7 8 the go"),
    ).toDF("id", "text")
    val out = Curation.gopherRules(docs, col("id"), col("text"), minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (9 to 15).map(out(id).getBoolean).toList
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("ok_symbol") && out(2L).getLong(4) == 2L)
    assert(!out(3L).getAs[Boolean]("ok_bullet") && out(3L).getLong(6) == 3L)
    assert(!out(4L).getAs[Boolean]("ok_ellipsis") && out(4L).getLong(7) == 2L)
    assert(!out(5L).getAs[Boolean]("ok_words"))
    assert(!out(6L).getAs[Boolean]("ok_alpha") && !out(6L).getAs[Boolean]("ok_stop"))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(i => !out(i).getAs[Boolean]("pass")))
    // '...' symbol counting is the non-overlapping replace scan: 5 dots -> 1
    val dots = Seq((1L, "w1 w2 w3 w4 w5 .....")).toDF("id", "text")
    assert(Curation.gopherRules(dots, col("id"), col("text")).head().getLong(4) == 1L)
    assert(flags(1L).forall(identity))
  }
}
