package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different words entirely unrelated text here"),
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id survivor with dup counts") {
    val out = Dedup.exact(docs, col("doc_id"), md5(col("text")))
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 4L))
    assert(out.head.getAs[Long]("dup_count") == 2)
  }

  test("similarity: NaN/mismatched vectors are excluded, never rank-1 neighbors") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),
      (3L, Seq(Double.NaN, 1.0, 1.0, 1.0)),   // NaN sorts above all reals in Spark
      (4L, Seq(0.0, 1.0)),                    // wrong dimension
    ).toDF("id", "vec")
    val queries = corpus.filter(col("id") === 1)
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSeq
    // only the one valid neighbor survives; NaN and dim-mismatch rows
    // neither rank first nor consume rank slots
    assert(got == Seq((2L, 1)))
    // LSH path: the mismatched/NaN vectors get a NULL bucket and drop out
    // of the candidate join instead of collapsing into bucket 0
    val lsh = Similarity.lshTopK(corpus, queries, k = 3, nBits = 4, dim = 4,
      probeHammingRadius = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(!lsh.contains(3L) && !lsh.contains(4L))
  }

  test("hard negatives: same-label and unlabeled rows never qualify") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), Some(7)),
      (2L, Seq(0.99, 0.01), Some(7)),  // nearest, but same label: excluded
      (3L, Seq(0.9, 0.1), Some(8)),    // best provably-wrong-label neighbor
      (4L, Seq(0.5, 0.5), None),       // unlabeled: could be a positive
      (5L, Seq(0.0, 1.0), Some(8)),
    ).toDF("id", "vec", "label")
    val got = Similarity.hardNegativeTopK(vecs, vecs.filter(col("id") === 1), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSeq
    assert(got == Seq((3L, 1), (5L, 2)))
    // an unlabeled QUERY mines nothing
    assert(Similarity.hardNegativeTopK(vecs, vecs.filter(col("id") === 4), k = 4)
      .count() == 0L)
  }

  test("IVF assignment maps to actual cell ids for non-contiguous centroid tables") {
    val corpus = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),   // near centroid 5
      (3L, Seq(10.0, 10.0)), (4L, Seq(9.9, 10.0)), // near centroid 9
    ).toDF("id", "vec")
    val idx = Similarity.buildIvfIndex(corpus, nCells = 2,
      centroidsIn = Some(Seq((5, Seq(0.0, 0.0)), (9, Seq(10.0, 10.0)))))
    val cells = idx.assigned.select(col("neighbor_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == Map(1L -> 5, 2L -> 5, 3L -> 9, 4L -> 9), cells)
    // and the probe join actually finds neighbors under those ids
    val res = Similarity.ivfQuery(idx, corpus.filter(col("id") === 1), k = 1, nProbe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(res == Seq(2L))
    idx.release()
  }

  test("incremental dedup: exact anti-join semantics, bloom path and fallback agree") {
    val seen = (1L to 300L).map(i => (i, s"doc text number ${i % 100}")).toDF("id", "text")
    val batch = (301L to 500L).map(i => (i, s"doc text number ${i % 150}")).toDF("id", "text")
    // ground truth: plain anti-join on the fingerprint
    val expected = batch.join(seen.select(md5(col("text")).as("fp")).distinct(),
        md5(col("text")) === col("fp"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    val bloomPath = Dedup.incrementalDedup(batch, md5(col("text")), seen, md5(col("text")),
        expectedSeen = 300)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    val fallback = Dedup.incrementalDedup(batch, md5(col("text")), seen, md5(col("text")),
        expectedSeen = 300, maxBloomItems = 10) // forces the no-bloom branch
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(bloomPath == expected)
    assert(fallback == expected)
    // batch rows with a NULL fingerprint always survive (null proves nothing)
    val withNull = batch.withColumn("text",
      when(col("id") === 400, lit(null.asInstanceOf[String])).otherwise(col("text")))
    val kept = Dedup.incrementalDedup(withNull, md5(col("text")), seen, md5(col("text")),
        expectedSeen = 300)
      .select(col("id")).collect().map(_.getLong(0))
    assert(kept.contains(400L))
  }

  test("minhash signatures: identical docs identical, near-dups close") {
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle"))
    val sigs = Dedup.minHashSignature(sh, col("doc_id"), col("shingle"), 16)
    val rows = sigs.orderBy(col("id")).collect()
    val s = rows.map(r => (r.getAs[Long]("id"), (0 until 16).map(i => r.getAs[Long](s"mh_$i")))).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(4L))

    val pairs = Dedup.minHashLshPairs(sigs, 4, 4, 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    assert(pairs.exists(p => p._1 == 1 && p._2 == 2 && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 4 || p._1 == 4))
  }

  test("simhash: equal for identical docs, distant for unrelated") {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val s = Dedup.simHash32(toks, col("doc_id"), col("token"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(s(1L) == s(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(3L)) < hamming(s(1L), s(4L)))
  }

  test("ngram jaccard pairs find exact and near duplicates") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.3)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L))
  }

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
  ).toDF("id", "vec")

  test("brute-force cosine top-k is exact and ordered") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter(col("id") === 1), 2)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(got.head.getAs[Double]("cosine") > 0.99)
  }

  test("int8 quantization: bytes bounded, extremes hit ±127, exact roundtrip order") {
    val q = Similarity.quantizeEmbeddings(vecs, col("id"), col("vec"))
      .orderBy(col("id")).collect()
    val qv = q.map(r => r.getAs[scala.collection.Seq[Byte]]("qvec"))
    assert(qv.forall(_.forall(b => b >= -127 && b <= 127)))
    // max-|v| element quantizes to exactly 127; id=2's 0.1 -> round(0.1/(0.9/127)) = 14
    assert(qv(0).toSeq == Seq[Byte](127, 0, 0, 0))
    assert(qv(1).toSeq == Seq[Byte](127, 14, 0, 0))
  }

  test("quantized top-k matches brute force on separated vectors") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("id") === 1), 2)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val quant = Similarity.quantizedTopK(vecs, vecs.filter(col("id") === 1), 2)
      .orderBy(col("rank")).collect()
    assert(quant.map(_.getAs[Long]("neighbor_id")).toSeq == brute)
    // re-rank stage outputs EXACT float cosine, not the quantized estimate
    assert(quant.head.getAs[Double]("cosine") ==
      Similarity.bruteForceTopK(vecs, vecs.filter(col("id") === 1), 2)
        .orderBy(col("rank")).collect().head.getAs[Double]("cosine"))
  }

  test("LSH top-k finds the strong neighbor via bucket join") {
    val got = Similarity.lshTopK(vecs, vecs.filter(col("id") === 1), 2,
      nBits = 4, dim = 4, probeHammingRadius = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(got.contains(2L)) // near-identical vector must share a probed bucket
  }

  test("embedding near-dup hot-bucket cap skips the degenerate bucket only") {
    import spark.implicits._
    // 50 identical vectors (one hot bucket, 1225 would-be pairs) plus one
    // isolated near-dup pair far from the clones
    val clones = (0L until 50L).map(i => (i, Seq.fill(8)(0.5f)))
    val pair = Seq((100L, Seq(1.0f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)),
      (101L, Seq(0.99f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)))
    val vecs8 = (clones ++ pair).toDF("id", "vec")
    val uncapped = Similarity.embeddingNearDupPairs(vecs8, 0.99, nBits = 6, dim = 8)
      .count()
    val capped = Similarity.embeddingNearDupPairs(vecs8, 0.99, nBits = 6, dim = 8,
      maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == 1225 + 1)
    assert(capped == Set((100L, 101L))) // hot bucket skipped, real pair kept
    // the stats report prices the hot bucket for cap sizing
    val stats = Similarity.lshBucketStats(vecs8, nBits = 6, dim = 8)
      .orderBy(col("n_vecs").desc).collect()
    assert(stats.head.getAs[Long]("n_vecs") == 50 &&
      stats.head.getAs[Double]("n_pairs") == 1225.0)
  }

  test("connected components resolve transitive near-dup groups") {
    // chain 1-2-3 plus pair 7-8: components {1,2,3}->1, {7,8}->7
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))

    val all = Seq(1L, 2L, 3L, 5L, 7L, 8L).toDF("id")
    val kept = Dedup.dedupByPairs(all, pairs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 7L)) // reps + untouched singleton
  }

  test("connected components: distributed fixpoint == driver union-find") {
    // random-ish graph with chains, a star, dups and reversed edges; force
    // the distributed large-star/small-star path with localThreshold = 0
    // and require identical labels to the driver tail.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (9L, 4L), (10L, 9L), // chain with reversals
      (20L, 21L), (20L, 22L), (20L, 23L), // star
      (30L, 31L), (31L, 30L), (30L, 31L), // dups both directions
      (40L, 40L), // self loop -> isolated node
    ).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(edges, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local(4L) == 1L && local(10L) == 1L && local(23L) == 20L
      && local(31L) == 30L && local(40L) == 40L)
  }

  test("corpus pipeline: quality gate, exact dedup, near-dup survivors") {
    import graft.operators.CorpusPipeline
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then rests in the shade"),
      (2L, "the quick brown fox jumps over the lazy dog and then rests in the shade"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog and then rests in the sun"), // near dup
      (4L, "completely different content about a gardening manual for tomato plants and soil"),
      (5L, "short"), // fails quality length gate
    ).toDF("id", "text")
    val result = CorpusPipeline.buildCorpus(docs,
      CorpusPipeline.CorpusConfig(minQuality = 0.5, nearDupThreshold = 0.5))
    val corpus = result.corpus.collect().map(_.getAs[Long]("id")).toSet
    result.unpersist()
    assert(corpus == Set(1L, 4L)) // 2 exact-dup, 3 near-dup, 5 low-quality
  }

  test("repetition score: looped text high, varied text zero, short text zero") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "spam ham eggs spam ham eggs spam ham eggs spam ham eggs"), // looped
      (2L, "every single word here is used exactly once in this doc"), // varied
      (3L, "too short"), // below window size
    ).toDF("id", "text")
    val got = docs.select(col("id"),
      TextFunctions.repetitionScore(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > 0.5) // 12 tokens -> 10 windows, only 3 distinct
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("group centroids: position-ordered exact means per key") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 6.0f)), ("b", Seq(10.0f, 0.0f)),
    ).toDF("k", "vec")
    val got = Similarity.groupCentroids(df, col("k"), col("vec"))
      .orderBy(col("k")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got == Map("a" -> Seq(2.0, 4.0), "b" -> Seq(10.0, 0.0)))
  }

  test("IVF top-k: probe-limited search finds the strong neighbor") {
    // 12 corpus vectors: a tight cluster around e1 and another around e2.
    val corpus = (0 until 12).map { i =>
      val base = if (i < 6) Seq(1.0f, 0.02f * i, 0f, 0f) else Seq(0.02f * i, 1.0f, 0f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    val got = Similarity.ivfTopK(corpus, corpus.filter(col("id") === 0), k = 3,
      nCells = 2, nProbe = 1)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("neighbor_id"))
    // all neighbors come from the same cell (the e1-cluster)
    assert(got.nonEmpty && got.forall(_ < 6))
  }

  test("IVF index build/query split equals the one-shot path; centroids reusable") {
    val corpus = (0 until 12).map { i =>
      val base = if (i < 6) Seq(1.0f, 0.02f * i, 0f, 0f) else Seq(0.02f * i, 1.0f, 0f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    val queries = corpus.filter(col("id").isin(0L, 7L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(identity).toSeq

    val oneShot = rows(Similarity.ivfTopK(corpus, queries, k = 3, nCells = 2, nProbe = 1))
    val idx = Similarity.buildIvfIndex(corpus, nCells = 2)
    try {
      assert(rows(Similarity.ivfQuery(idx, queries, k = 3, nProbe = 1)) == oneShot)
      // pre-trained centroids skip Lloyd but give the same answer
      val reused = rows(Similarity.ivfTopK(corpus, queries, k = 3, nCells = 2,
        nProbe = 1, centroidsIn = Some(idx.centroids)))
      assert(reused == oneShot)
    } finally idx.release()
  }

  test("IVF index save/load: disk-backed queries match, scan is partition-pruned") {
    val corpus = (0 until 12).map { i =>
      val base = if (i < 6) Seq(1.0f, 0.02f * i, 0f, 0f) else Seq(0.02f * i, 1.0f, 0f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    val queries = corpus.filter(col("id").isin(0L, 7L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(identity).toSeq

    val idx = Similarity.buildIvfIndex(corpus, nCells = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    try {
      Similarity.saveIvfIndex(idx, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      assert(loaded.centroids == idx.centroids)
      val disk = Similarity.ivfQuery(loaded, queries, k = 3, nProbe = 1)
      assert(rows(disk) == rows(Similarity.ivfQuery(idx, queries, k = 3, nProbe = 1)))
      // the 100 TB property: the broadcast probe side dynamically prunes
      // the cell-partitioned scan — a batch reads only probed partitions
      val plan = disk.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan.take(2000))
    } finally idx.release()
  }

  test("streaming IVF ingest: appended vectors visible to the reloaded index") {
    val corpus = (0 until 12).map { i =>
      val base = if (i < 6) Seq(1.0f, 0.02f * i, 0f, 0f) else Seq(0.02f * i, 1.0f, 0f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    val idx = Similarity.buildIvfIndex(corpus, nCells = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-ivf-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-ckpt").toString
    try {
      Similarity.saveIvfIndex(idx, dir)
      // a near-clone of query 0's vector arrives on the stream
      java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "new.json"),
        """{"id":100,"vec":[1.0,0.001,0.0,0.0]}""" + "\n" +
          """{"id":101,"vec":[0.0,0.0,1.0,0.0]}""")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
      val stream = spark.readStream.schema(schema).json(inDir)
      val q = Similarity.streamingIvfIngest(stream, idx.centroids, dir, ckpt)
      try q.processAllAvailable() finally q.stop()

      val loaded = Similarity.loadIvfIndex(spark, dir)
      val got = Similarity.ivfQuery(loaded, corpus.filter(col("id") === 0L), k = 1, nProbe = 1)
        .collect()
      // the streamed clone (id 100) displaces every batch vector as top-1
      assert(got.length == 1 && got.head.getAs[Long]("neighbor_id") == 100L)
    } finally idx.release()
  }

  test("IVF load ignores a stream area whose sink log commits nothing") {
    val corpus = (0 until 12).map { i =>
      val base = if (i < 6) Seq(1.0f, 0.02f * i, 0f, 0f) else Seq(0.02f * i, 1.0f, 0f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    val idx = Similarity.buildIvfIndex(corpus, nCells = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-orphan").toString
    try {
      Similarity.saveIvfIndex(idx, dir)
      // a crashed first batch: the sink log exists but commits zero adds
      // ("v1" header only), and an orphan uncommitted part file sits in a
      // cell directory. read.parquet trusts the log, so the loader must
      // treat this area as empty — counting the orphan file would feed
      // the log-owned read exactly the zero-committed-files case that
      // fails schema inference.
      val streamDir = java.nio.file.Paths.get(dir, "assigned_stream")
      java.nio.file.Files.createDirectories(streamDir.resolve("_spark_metadata"))
      java.nio.file.Files.writeString(streamDir.resolve("_spark_metadata").resolve("0"), "v1\n")
      java.nio.file.Files.createDirectories(streamDir.resolve("cell=0"))
      java.nio.file.Files.writeString(streamDir.resolve("cell=0").resolve("part-orphan.parquet"),
        "not a committed file")
      val loaded = Similarity.loadIvfIndex(spark, dir)
      val got = Similarity.ivfQuery(loaded, corpus.filter(col("id") === 0L), k = 1, nProbe = 1)
        .collect()
      assert(got.length == 1) // base index serves; orphan neither crashes nor contributes
    } finally idx.release()
  }

  test("multimodal: undecodable payloads take the byte-fallback path, loudly flagged") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "fakepngbytes".getBytes, Some(4), Some(4), None),
      Multimodal.MediaRow(2L, "audio", "fakewavbytes".getBytes, None, None, Some(1000L)),
    ).toDS()
    val f = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f.length == 2 && f.forall(_.feature.length == 8))
    assert(f.forall(!_.decoded)) // neither payload is a real image
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
    assert(f(0).n_values == "fakepngbytes".length)
  }

  test("multimodal resize: byte-fallback nearest-neighbor resample, metadata replaced") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq(
      Multimodal.MediaRow(1L, "image", payload, Some(10), Some(10), None),
      Multimodal.MediaRow(2L, "image", Array.emptyByteArray, Some(0), Some(0), None),
    ).toDS()
    val out = Multimodal.resizeImages(media, dstW = 4, dstH = 4)
      .collect().sortBy(_.media_id)
    assert(out.map(r => (r.width, r.height)).toSeq == Seq((4, 4), (4, 4)))
    // out(j) = in(j*100/16): spot-check the resample map, not just shape
    assert(out(0).payload.toSeq == (0 until 16).map(j => (j * 100 / 16).toByte))
    assert(out(0).n_bytes == 16 && out(1).n_bytes == 0)
    // upsampling repeats source bytes rather than failing
    val up = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(3L, "image", Array[Byte](7, 9), None, None, None)).toDS(),
      dstW = 2, dstH = 2).collect().head
    assert(up.payload.toSeq == Seq[Byte](7, 7, 9, 9))
  }

  test("multimodal frame sampling: one row per everyMs tick, min one frame") {
    import spark.implicits._
    val payload = (0 until 50).map(_.toByte).toArray
    val media = Seq(
      // 450 ms at 100 ms/frame -> 4 frames; slices at offsets i*50/4
      Multimodal.MediaRow(1L, "video", payload, None, None, Some(450L)),
      // no duration -> single frame at ts 0
      Multimodal.MediaRow(2L, "video", payload, None, None, None),
    ).toDS()
    val out = Multimodal.sampleFrames(media, everyMs = 100L, frameBytes = 8)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    val v1 = out.filter(_.media_id == 1L)
    assert(v1.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(v1.map(_.ts_ms).toSeq == Seq(0L, 100L, 200L, 300L))
    assert(v1.forall(_.n_bytes == 8))
    assert(v1(2).payload.toSeq == (25 until 33).map(_.toByte)) // offset 2*50/4
    val v2 = out.filter(_.media_id == 2L)
    assert(v2.length == 1 && v2.head.ts_ms == 0L)
    // tail clamp: last frame shorter than frameBytes when payload runs out
    val tail = Multimodal.sampleFrames(
      Seq(Multimodal.MediaRow(3L, "video", (0 until 10).map(_.toByte).toArray,
        None, None, Some(200L))).toDS(),
      everyMs = 100L, frameBytes = 8).collect().sortBy(_.frame_idx)
    assert(tail.map(_.n_bytes).toSeq == Seq(8, 5)) // frame 1 starts at byte 5
  }

  test("exact dedup: NULL fingerprints never collapse together") {
    val withNulls = Seq(
      (1L, "same"), (2L, "same"), // real dup pair
      (3L, null), (4L, null), (5L, null), // md5(null) = null — all distinct docs
    ).toDF("doc_id", "text")
    val out = Dedup.exact(withNulls, col("doc_id"), md5(col("text")))
      .select("doc_id", "dup_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivor 1 covers 2; every null-fingerprint row survives alone
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L), out.toString)
  }

  test("minHashLshPairs rejects a banding that does not tile the signature") {
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), 2)).as("shingle"))
    val sigs = Dedup.minHashSignature(sh, col("doc_id"), col("shingle"), 16)
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashLshPairs(sigs, numBands = 5, rowsPerBand = 3, threshold = 0.5)
    }
    assert(e.getMessage.contains("tile"), e.getMessage)
    intercept[IllegalArgumentException] {
      // 32 bands of width 16/32 = 0 (the integer-division config trap)
      Dedup.minHashLshPairs(sigs, numBands = 32, rowsPerBand = 0, threshold = 0.5)
    }
  }

  test("cosine: NULL vector propagates NULL; zero vector scores 0.0") {
    import graft.functions.VectorFunctions
    val df = Seq(
      (1L, Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (2L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 0.0))), // zero norm -> 0.0
      (3L, None, Some(Seq(1.0, 0.0))), // null vec -> NULL
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .orderBy(col("id")).collect()
    assert(got(0).getDouble(1) == 1.0)
    assert(got(1).getDouble(1) == 0.0)
    assert(got(2).isNullAt(1), got(2).toString)
  }

  test("lshTopK rejects an unimplemented probe radius") {
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(docsVecs, docsVecs, k = 1, nBits = 4, dim = 2,
        probeHammingRadius = 2)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  private def docsVecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "vec")

  test("IVF training survives corrupt vectors (null element / wrong dim)") {
    val corpus = Seq(
      (1L, Seq[Option[Double]](Some(0.0), Some(0.0))),
      (2L, Seq[Option[Double]](Some(0.1), Some(0.0))),
      (3L, Seq[Option[Double]](Some(5.0), Some(5.0))),
      (4L, Seq[Option[Double]](Some(5.1), Some(5.0))),
      (5L, Seq[Option[Double]](Some(1.0), None)), // null element
      (6L, Seq[Option[Double]](Some(1.0))), // wrong dimension
    ).toDF("id", "vec")
    val cents = Similarity.deterministicCentroids(corpus, nCells = 2, iters = 2)
    assert(cents.length == 2) // trains on the 4 clean vectors, no crash
    assert(cents.forall(_._2.length == 2))
  }

  test("text quality + langid heuristics behave on edge inputs") {
    val df = Seq((1L, "the of and a to in is that the of"), (2L, "xyzzy")).toDF("doc_id", "text")
    val m = df.select(col("doc_id"), TextFunctions.qualityMetrics(col("text")).as("m"),
      TextFunctions.langIdHeuristic(col("text")).as("lang")).orderBy(col("doc_id")).collect()
    assert(m(0).getAs[String]("lang") == "en")
    assert(m(1).getAs[String]("lang") == "und")
    val q1 = m(0).getAs[org.apache.spark.sql.Row]("m")
    assert(q1.getAs[Long]("n_tokens") == 10L)
    assert(q1.getAs[Double]("stopword_ratio") == 1.0)
  }

  test("incrementalNearDup: store roundtrip flags planted near-dups, misses unrelated") {
    def sigs(d: org.apache.spark.sql.DataFrame) = Dedup.minHashSignature(
      d.select(col("doc_id").as("id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle")),
      col("id"), col("shingle"), numHashes = 16)
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark plans broadcast small dimension tables for joins"),
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact copy of 1
      (11L, "the quick brown fox jumps over the lazy cat"), // near copy of 1
      (12L, "entirely unrelated words about nothing shared at all"),
    ).toDF("doc_id", "text")
    // persist the store and read it back — the signature-store contract:
    // flags must be identical whether the store frame is live or reloaded
    val storeDir = java.nio.file.Files.createTempDirectory("sig_store").toString
    sigs(seen).write.mode("overwrite").parquet(storeDir)
    val store = spark.read.parquet(storeDir)
    def run(st: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNearDup(sigs(batch), st, numBands = 4, rowsPerBand = 4, 0.5)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val live = run(sigs(seen))
    val reloaded = run(store)
    assert(live == reloaded)
    assert(live.map(_._1) == Seq(10L, 11L, 12L))
    assert(live(0)._2 == 1.0 && live(0)._3, live.toString) // exact copy
    assert(live(1)._3, live.toString) // near copy over threshold
    assert(live(2)._2 == 0.0 && !live(2)._3, live.toString) // unrelated
    // width mismatch (store built with different numHashes) fails loudly
    val narrow = Dedup.minHashSignature(
      seen.select(col("doc_id").as("id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle")),
      col("id"), col("shingle"), numHashes = 8)
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(sigs(batch), narrow, 4, 4, 0.5)
    }
  }

  test("bradleyTerry: dominant item ranks first, integer fit is partition-invariant") {
    import graft.operators.Preference
    // a beats b 9:1, b beats c 9:1, c never wins
    val comps = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) :+ ("a", "a") /* dropped */)
      .toDF("w", "l")
    val got = Preference.bradleyTerry(comps, col("w"), col("l"), iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val byItem = got.map(r => r._1 -> r).toMap
    assert(byItem("a")._5 == 1 && byItem("c")._5 == 3, got.toSeq.toString)
    assert(byItem("a")._4 > byItem("b")._4 && byItem("b")._4 > byItem("c")._4)
    assert(byItem("a")._2 == 9L && byItem("a")._3 == 10L) // wins / matches
    // partitioning-layout invariance of the integer fit
    val again = Preference.bradleyTerry(comps.repartition(7), col("w"), col("l"), 3)
      .collect().map(r => (r.getString(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(again == got.map(r => (r._1, r._4)).sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(comps, col("w"), col("l"), iterations = 0)
    }
  }

  test("rougeN: clipped bigram overlap against hand math; short texts keep NULL metrics") {
    import graft.operators.Search
    val pairs = Seq(
      // cand bigrams: [the cat, cat sat, sat down]; ref: [the cat, cat sat, sat up]
      // overlap = 2 -> p = r = 2/3, f1 = 2/3
      (1L, "the cat sat down", "the cat sat up"),
      // repeated bigram clipping: cand has "a a" x2, ref "a a" x1 -> overlap 1
      (2L, "a a a", "a a"),
      // reference shorter than n: NULL recall/f1 path -> metrics NULL
      (3L, "some long candidate text", "x"),
    ).toDF("pair_id", "cand", "ref")
    val got = Search.rougeN(pairs, col("pair_id"), col("cand"), col("ref"), n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getLong(3) == 2L) // overlap
    assert(r1.getDouble(4) == 2.0 / 3.0 && r1.getDouble(5) == 2.0 / 3.0)
    assert(math.abs(r1.getDouble(6) - 2.0 / 3.0) < 1e-15)
    val r2 = got(2L)
    assert(r2.getLong(1) == 2L && r2.getLong(2) == 1L && r2.getLong(3) == 1L)
    val r3 = got(3L)
    assert(r3.getLong(2) == 0L && r3.isNullAt(5) && r3.isNullAt(6))
  }

  test("tfidfNearDupPairs: identical docs ~1.0, df cap gates candidates, weighting discriminates") {
    import graft.operators.Dedup
    // A and B identical; C unrelated; D shares only the UBIQUITOUS
    // shingle (present in all four docs -> df = 4 > maxDf = 3, so it can
    // never generate a candidate pair on its own)
    val common = "p q r"
    val docs = Seq(
      (1L, s"$common a b c d e"),
      (2L, s"$common a b c d e"),
      (3L, s"$common u v w x y"),
      (4L, common)).toDF("id", "text")
    val got = Dedup.tfidfNearDupPairs(docs, col("id"), col("text"),
      shingleN = 3, threshold = 0.5, maxDf = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set((1L, 2L)), got.toString)
    val (nShared, cos) = got((1L, 2L))
    assert(nShared >= 5L) // all shingles shared
    assert(math.abs(cos - 1.0) < 1e-12, cos.toString)
    // determinism of the sorted folds across partitionings
    val a = Dedup.tfidfNearDupPairs(docs.repartition(5), col("id"), col("text"), 3, 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val b = Dedup.tfidfNearDupPairs(docs.coalesce(1), col("id"), col("text"), 3, 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(a == b)
  }

  test("reciprocalNearestNeighbors: mutuality filters hubs, symmetric cosine, both ranks") {
    import graft.operators.Similarity
    // k=1: v1<->v2 mutual (cos 0.8 each way); v3's neighbor is v2 but
    // v2's is v1, so v3 pairs with nobody
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(4.0, 3.0, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "vec")
    val got = Similarity.reciprocalNearestNeighbors(vecs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 0.8, 1L, 1L)))
    // k=2 over 3 vectors: every pair is mutual
    val all = Similarity.reciprocalNearestNeighbors(vecs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("rakeKeywords: degree/freq hand math, stopword phrase boundaries, top order") {
    import graft.operators.Search
    // "big data systems of data": phrases [big data systems], [data];
    // freq: big 1, data 2, systems 1; degree: big 3, data 4, systems 3;
    // wsc: big 3, data 2, systems 3 -> scores 8.0 and 2.0
    val docs = Seq((1L, "big data systems of data")).toDF("doc_id", "text")
    val got = Search.rakeKeywords(docs, col("doc_id"), col("text"),
      stopwords = Seq("of", "the"), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("big data systems", 3L, 1L, 8.0), ("data", 1L, 1L, 2.0)))
    // repeated phrase rolls up; partitioning invariance of the fold
    val docs2 = Seq((1L, "big data of big data"), (2L, "big data")).toDF("doc_id", "text")
    val a = Search.rakeKeywords(docs2, col("doc_id"), col("text"), Seq("of"), 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(a.head._1 == "big data" && a.head._2 == 3L) // 3 occurrences, one row
    val b = Search.rakeKeywords(docs2.repartition(5), col("doc_id"), col("text"), Seq("of"), 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("timeEmbargoSplit: exact-quantile cutoff, embargo band, boundary semantics") {
    import graft.operators.Curation
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 10).map(i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 3600L * 1000L)))
    val df = rows.toDF("id", "ts")
    // n=10, q=80 -> rank = floor(9*0.8)+1 = 8 -> cutoff = t8; embargo 1h:
    // t8 itself is the embargo band (t7 = cutoff-1h -> train), t9/t10 test
    val got = Curation.timeEmbargoSplit(df, col("id"), col("ts"),
      cutPercent = 80, embargoMicros = 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1 to 7).forall(i => got(i.toLong) == "train"), got.toString)
    assert(got(8L) == "embargo")
    assert(got(9L) == "test" && got(10L) == "test")
    // zero embargo: band empty, plain temporal split
    val z = Curation.timeEmbargoSplit(df, col("id"), col("ts"), 80, 0L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(z.values.count(_ == "embargo") == 0 && z(8L) == "train")
  }

  test("mmrTopK: diversity beats a duplicate, hand math exact, dup ranks last") {
    import graft.operators.Similarity
    // q=(1,0): rel(10)=rel(20)=0.8 (exact duplicates), rel(30)=0.6 but
    // 30 is ORTHOGONAL to 10 -> MMR picks 10, then 30 (0.3 > -0.1), dup
    // 20 last; relevance-only order would be (10, 20, 30)
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (10L, Seq(4.0, 3.0, 0.0, 0.0)),
      (20L, Seq(4.0, 3.0, 0.0, 0.0)),
      (30L, Seq(3.0, -4.0, 0.0, 0.0))).toDF("id", "vec")
    val got = Similarity.mmrTopK(corpus, corpus.filter(col("id") === 1), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == Seq(10L, 30L, 20L), got.toSeq.toString)
    assert(got(0)._2 == 0.8 && got(0)._3 == 0.5 * 0.8) // first pick: pure relevance
    assert(got(1)._2 == 0.6 && got(1)._3 == 0.5 * 0.6 - 0.5 * 0.0)
    assert(got(2)._3 == 0.5 * 0.8 - 0.5 * 1.0) // the duplicate's full penalty
    // rerun is bit-identical (bounded driver loop, no nondeterminism)
    val again = Similarity.mmrTopK(corpus.repartition(5), corpus.filter(col("id") === 1), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == again.toSeq)
  }

  test("lateInteractionTopK: MaxSim equals hand math; sum is tok-ordered and invariant") {
    import graft.operators.Similarity
    // orthogonal unit axes make cosines exactly 0/1: passage 10 holds
    // both query tokens' axes (score 2), passage 20 one (score 1),
    // passage 30 neither (score 0)
    def axis(i: Int): Seq[Double] = (0 until 4).map(j => if (j == i) 1.0 else 0.0)
    val dt = Seq(
      (10L, 0L, axis(0)), (10L, 1L, axis(1)),
      (20L, 0L, axis(0)), (20L, 1L, axis(2)),
      (30L, 0L, axis(2)), (30L, 1L, axis(3))).toDF("doc_id", "tok_id", "vec")
    val qt = Seq((1L, 0L, axis(0)), (1L, 1L, axis(1))).toDF("query_id", "tok_id", "vec")
    val got = Similarity.lateInteractionTopK(dt, qt, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq((10L, 2L, 2.0, 1L), (20L, 2L, 1.0, 2L), (30L, 2L, 0.0, 3L)))
    // partitioning invariance of the fixed-order score fold
    val a = Similarity.lateInteractionTopK(dt.repartition(7), qt, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    val b = Similarity.lateInteractionTopK(dt.coalesce(1), qt, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(a == b)
  }

  test("bleuPairs: clipped precisions, brevity penalty, NULL on undefined") {
    import graft.operators.Search
    val pairs = Seq(
      // identical: p1 = p2 = 1, c = r -> bp = 1 -> bleu2 = 1
      (1L, "the cat sat down", "the cat sat down"),
      // cand "a a a" vs ref "a a": unigram clip = 2 -> p1 = 2/3;
      // bigrams cand [a a, a a] ref [a a]: clip = 1 -> p2 = 1/2;
      // c = 3 > r = 2 -> bp = 1 -> bleu2 = round(sqrt(1/3), 6)
      (2L, "a a a", "a a"),
      // short candidate: c = 2 < r = 4 -> bp = exp(1 - 2) = e^-1;
      // p1 = 1, p2 = 1 -> bleu2 = round(e^-1, 6)
      (3L, "the cat", "the cat sat down"),
      // candidate has no bigrams -> p2 NULL -> bleu2 NULL
      (4L, "x", "x y"),
    ).toDF("pair_id", "cand", "ref")
    val got = Search.bleuPairs(pairs, col("pair_id"), col("cand"), col("ref"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(8) == 1.0)
    val r2 = got(2L)
    assert(r2.getLong(3) == 2L && r2.getLong(4) == 2L && r2.getLong(5) == 1L)
    assert(r2.getDouble(6) == 2.0 / 3.0 && r2.getDouble(7) == 0.5)
    assert(r2.getDouble(8) ==
      BigDecimal(math.sqrt(2.0 / 3.0 * 0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val r3 = got(3L)
    assert(r3.getDouble(6) == 1.0 && r3.getDouble(7) == 1.0)
    assert(math.abs(r3.getDouble(8) - 0.367879) < 1e-9, r3.getDouble(8).toString)
    val r4 = got(4L)
    assert(r4.getLong(4) == 0L && r4.isNullAt(7) && r4.isNullAt(8))
  }

  test("winRateReport: canonical pairs, exact counts, Wilson bounds bracket the rate") {
    import graft.operators.Preference
    val comps = (Seq.fill(8)(("a", "b")) ++ Seq.fill(2)(("b", "a")) :+ ("b", "c"))
      .toDF("w", "l")
    val got = Preference.winRateReport(comps, col("w"), col("l"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val ab = got(("a", "b"))
    assert(ab._1 == 10L && ab._2 == 8L && ab._3 == 0.8)
    assert(ab._4 > 0.4 && ab._4 < 0.8 && ab._5 > 0.8 && ab._5 <= 1.0, ab.toString)
    // single observation: bounds nearly span the unit interval — the
    // "3-0 is not evidence" property the report exists for
    val bc = got(("b", "c"))
    assert(bc._1 == 1L && bc._3 == 1.0 && bc._4 < 0.3 && bc._5 == 1.0, bc.toString)
  }

  test("chosenRejected: extremes with deterministic tie-break, contrast-free prompts drop") {
    import graft.operators.Preference
    val rows = Seq(
      (1L, 11L, 0.2), (1L, 12L, 0.9), (1L, 13L, 0.5), // clear best/worst
      (2L, 21L, 0.7), (2L, 22L, 0.7),                 // score tie -> id tie-break
      (3L, 31L, 0.4),                                 // single response -> dropped
    ).toDF("prompt", "resp", "score")
    val got = Preference.chosenRejected(rows, col("prompt"), col("resp"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(5))).toSeq
    assert(got == Seq((1L, "12", "11", 0.7000000000000001) , (2L, "22", "21", 0.0)) ||
      got == Seq((1L, "12", "11", 0.9 - 0.2), (2L, "22", "21", 0.0)), got.toString)
    // deterministic across partitionings
    val a = Preference.chosenRejected(rows.repartition(5), col("prompt"), col("resp"), col("score"))
      .collect().map(_.toSeq).toSeq
    val b = Preference.chosenRejected(rows, col("prompt"), col("resp"), col("score"))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("containmentPairs: subset-dup fires where jaccard stays low") {
    val quote = "alpha beta gamma delta epsilon"
    val article = s"intro words first $quote closing words after end here now"
    val docs = Seq(
      (1L, quote),              // fully contained in 2
      (2L, article),
      (3L, "totally unrelated content about other things entirely"),
    ).toDF("id", "text")
    val got = Dedup.containmentPairs(docs, col("id"), col("text"),
      n = 3, threshold = 0.9, maxShingleDf = 10).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)), "small doc is the contained side")
    assert(r.getDouble(5) == 1.0, s"every quote shingle appears in the article: $r")
    // jaccard on the same pair is well below the containment
    val j = Dedup.ngramJaccardPairs(docs, col("id"), col("text"),
      n = 3, threshold = 0.01, maxShingleDf = 10)
      .filter(col("id_a") === 1L && col("id_b") === 2L).head()
    assert(j.getDouble(2) < 0.5)
  }

  test("centroidDrift: shifted label moves, stable label stays at 0") {
    import graft.operators.Similarity
    val a = Seq(
      (1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(2.0f, 0.0f)), // centroid (1,0)
      (3L, 1, Seq(5.0f, 5.0f)),                           // centroid (5,5)
      (4L, 2, Seq(9.0f, 9.0f)),                           // label only in a
    ).toDF("vec_id", "label", "embedding")
    val b = Seq(
      (11L, 0, Seq(4.0f, 0.0f)), (12L, 0, Seq(4.0f, 0.0f)), // centroid (4,0)
      (13L, 1, Seq(5.0f, 5.0f)),                            // unchanged
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(a, b, col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(got(0) == 9.0, s"centroid moved (1,0)->(4,0): dist2 9, got ${got(0)}")
    assert(got(1) == 0.0)
    assert(!got.contains(2), "one-sided labels drop")
  }

  test("minMaxScale: per-dim scaling, constant dims ship 0") {
    import graft.operators.Similarity
    val rows = Seq(
      (1L, Seq(0.0f, 5.0f, 2.0f)),
      (2L, Seq(10.0f, 5.0f, 4.0f)),
      (3L, Seq(5.0f, 5.0f, 6.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.minMaxScale(rows, col("vec_id"), col("embedding"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got((1L, 0L)) == 0.0 && got((2L, 0L)) == 1.0 && got((3L, 0L)) == 0.5)
    assert(Seq(1L, 2L, 3L).forall(i => got((i, 1L)) == 0.0), "constant dim -> 0")
    assert(got((2L, 2L)) == 0.5)
  }

  test("annRecallReport: intersection counts against a known split") {
    import graft.operators.Similarity
    val approx = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 99L, 3L), // 2 of 3 right
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L), // perfect
      (3L, 98L, 1L), (3L, 97L, 2L), (3L, 96L, 3L), // all wrong
    ).toDF("query_id", "neighbor_id", "rank")
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L),
      (4L, 40L, 1L), // query the index never answered
    ).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.annRecallReport(approx, exact, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2.0 / 3.0), (2L, 3L, 3L, 1.0),
      (3L, 3L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
  }

  test("tfidfTerms: group-distinctive terms outrank shared ones") {
    import graft.operators.Search
    val docs = Seq(
      ("s1", "shared shared quantum quantum quantum"),
      ("s2", "shared shared finance finance finance"),
      ("s3", "shared shared gardens gardens gardens"),
    ).toDF("src", "text")
    val got = Search.tfidfTerms(docs, col("src"), col("text"), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // "shared" has df=3 of N=3 -> idf ln(4/4)=0; each unique term df=1 ->
    // idf ln(2) > 0, so the unique term ranks first everywhere
    assert(got.filter(_._2 == 1L).map(_._3).sorted == Seq("finance", "gardens", "quantum"))
    val s1 = got.filter(_._1 == "s1")
    assert(s1.head._3 == "quantum")
    // idf of the everywhere-term is exactly 0 -> score 0
    val full = Search.tfidfTerms(docs, col("src"), col("text"), topK = 2)
      .filter(col("term") === "shared").collect()
    assert(full.forall(_.getAs[Double]("score") == 0.0))
  }

  test("distinctNgrams: corpus-scope bigram diversity per group") {
    import graft.operators.Search
    val docs = Seq(
      ("rep", "go go go go"),        // windows: "go go" x3 -> 3 total, 1 distinct
      ("rep", "go go"),              // +1 window, same gram -> 4 total, 1 distinct
      ("div", "alpha beta gamma"),   // 2 distinct windows
      ("div", "delta epsilon"),      // +1 -> 3 total, 3 distinct
      ("tiny", "one"),               // shorter than n -> no row
    ).toDF("src", "text")
    val got = Search.distinctNgrams(docs, col("src"), col("text"), n = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("rep") == ((4L, 1L, 0.25)))
    assert(got("div") == ((3L, 3L, 1.0)))
    assert(!got.contains("tiny"))
  }

  test("ngramNovelty: df==1 shingles over a shared-template corpus") {
    import graft.operators.Search
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),   // shares "the quick brown"+.. with 2
      (2L, "the quick brown fox runs far"),
      (3L, "completely different text lives here alone"),
      (4L, "ab"),                                // short doc -> whole-text shingle
    ).toDF("id", "text")
    val got = Search.ngramNovelty(docs, col("id"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 4 shingles, shares 2 ("the quick brown", "quick brown fox") -> 2 novel
    assert(got(1L) == ((4L, 2L)))
    assert(got(2L) == ((4L, 2L)))
    assert(got(3L) == ((4L, 4L)), "fully unique doc is 100% novel")
    assert(got(4L) == ((1L, 1L)), "short doc collapses to one whole-text shingle")
    val out = Search.ngramNovelty(docs, col("id"), col("text"), n = 3)
      .filter(col("id") === 3L).head()
    assert(out.getDouble(3) == 1.0)
  }

  test("labelOutliers: farthest-from-centroid per label, quantized-exact") {
    import graft.operators.Similarity
    // label 0: three vecs near origin + one far point; label 1: two points
    val rows = Seq(
      (1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(0.1f, 0.0f)),
      (3L, 0, Seq(0.0f, 0.1f)), (4L, 0, Seq(5.0f, 5.0f)),
      (10L, 1, Seq(1.0f, 1.0f)), (11L, 1, Seq(3.0f, 3.0f)),
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelOutliers(rows, col("vec_id"), col("label"),
      col("embedding"), k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.take(2) == Seq((0, 1L, 4L), (0, 2L, 1L)),
      s"far point ranks first in label 0, got $got")
    // label 1 is symmetric: both points equidistant -> tie breaks on id asc
    assert(got.drop(2) == Seq((1, 1L, 10L), (1, 2L, 11L)))
    // deterministic across partitionings (exact sums + bounded agg)
    val a = Similarity.labelOutliers(rows.repartition(5), col("vec_id"), col("label"),
      col("embedding"), k = 2).collect().map(_.toSeq).toSeq
    val b = Similarity.labelOutliers(rows, col("vec_id"), col("label"),
      col("embedding"), k = 2).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("passAtK: HumanEval estimator — closed-form cases and edges") {
    import graft.operators.Preference
    // task t1: n=4, c=2 -> pass@1 = c/n = 0.5; pass@2 = 1 - C(2,2)/C(4,2) = 5/6
    val rows = Seq(
      ("t1", true), ("t1", true), ("t1", false), ("t1", false),
      ("t2", false), ("t2", false), ("t2", false),  // c=0 -> pass 0
      ("t3", true),                                  // n=1 < 2 -> pass@2 NULL
    ).toDF("task", "ok")
    val got = Preference.passAtK(rows, col("task"), col("ok"), ks = Seq(1, 2))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(got("t1").getDouble(3) - 0.5) < 1e-15)
    assert(math.abs(got("t1").getDouble(4) - 5.0 / 6.0) < 1e-15)
    assert(got("t2").getDouble(3) == 0.0 && got("t2").getDouble(4) == 0.0)
    assert(got("t3").getDouble(3) == 1.0, "n=c=1: every 1-draw passes")
    assert(got("t3").isNullAt(4), "k > n is undefined, not 0")
  }

  test("groupAdvantage: GRPO normalization — exact stats, degenerate groups ship 0") {
    import graft.operators.Preference
    val rows = Seq(
      (1L, 11L, 10L), (1L, 12L, 20L), (1L, 13L, 30L), // mean 20, var 200/3
      (2L, 21L, 5L), (2L, 22L, 5L),                   // all equal -> std 0
      (3L, 31L, 7L),                                  // singleton -> std 0
    ).toDF("g", "id", "r")
    val got = Preference.groupAdvantage(rows, col("g"), col("id"), col("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).toSeq
    val std1 = math.sqrt(200.0 / 3.0) // squared devs 100+0+100 over n=3
    assert(got.size == 6)
    val g1 = got.filter(_._1 == 1L)
    assert(g1.map(_._3).forall(_ == 20.0))
    assert(math.abs(g1.head._4 - std1) < 1e-12)
    assert(math.abs(g1.map(_._5).sum) < 1e-12, "advantages center to 0")
    assert(g1.find(_._2 == 13L).get._5 > 0 && g1.find(_._2 == 11L).get._5 < 0)
    assert(got.filter(_._1 != 1L).map(_._5).forall(_ == 0.0), "degenerate groups -> 0")
    // deterministic across partitionings (exact integer sums)
    val a = Preference.groupAdvantage(rows.repartition(7), col("g"), col("id"), col("r"))
      .collect().map(_.toSeq).toSeq
    val b = Preference.groupAdvantage(rows, col("g"), col("id"), col("r"))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
