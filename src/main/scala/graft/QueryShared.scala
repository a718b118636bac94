package graft

import graft.fdr.TargetDecoy
import graft.functions.{PeptideFunctions, TextFunctions, UsiFunctions}
import graft.operators.{Dedup, Similarity, SpectraCluster}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Helpers shared by the per-family query registries (split out of the
  * single Queries object in round 11): table loading, session-scoped
  * deterministic-model memos, driver-projection guards, and the reusable
  * DuckDB oracle CTE fragments. Everything here is package-private and
  * consumed only by the Queries* registry objects. */
private[graft] object QueryShared {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = Tables(s, dir, name)

  /** Session-scoped deterministic-model memos (LSH pair graph, bigram LM,
    * IVF centroids, PQ codebooks, NSW indexes): derived artifacts that
    * many registered queries share — training/deriving them once per
    * (session, sf-dir) and lazy-pinning the small results removes
    * redundant full-corpus passes from a Verify/Bench session without
    * touching any query's semantics or oracle.
    *
    * Lifecycle (round-12, verdict r11 "what's wrong" #1): ONE WeakHashMap
    * keyed by the SESSION OBJECT (the demoDirMemo discipline) holding a
    * per-session TrieMap keyed by (kind, sf-dir). A stopped session's
    * pinned frames and localCheckpoint files become GC-reclaimable with
    * the session instead of staying pinned for the JVM lifetime, and a
    * recycled identityHashCode can never hand a new session a dead
    * session's frame. InvarianceCheck's two differently-configured
    * sessions still never share state (distinct keys). A racing build of
    * the same memo may run twice (TrieMap.getOrElseUpdate is not atomic);
    * both results are deterministic and identical, so the only cost is
    * one redundant derivation — Verify/Bench are single-threaded per
    * session anyway. */
  private val sessionMemos =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, AnyRef]]()
  private[graft] def memo[T <: AnyRef](s: SparkSession, key: String)(build: => T): T = {
    val m = sessionMemos.synchronized {
      sessionMemos.computeIfAbsent(s, _ => scala.collection.concurrent.TrieMap.empty)
    }
    m.getOrElseUpdate(key, build).asInstanceOf[T]
  }

  /** Full-corpus near-dup LSH candidate-pair set (3-gram shingles, 16-hash
    * MinHash, 4x4 bands, threshold 0.5) — the similarity graph EIGHT
    * registered queries build downstream structure on. */
  private[graft] def sharedLshPairs(s: SparkSession, dir: String): DataFrame =
    memo(s, s"lshPairs|$dir") {
      val docs = t(s, dir, "documents")
      val shingles = docs.select(col("doc_id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle"))
      val sigs = Dedup.minHashSignature(shingles, col("doc_id"), col("shingle"), 16)
      Dedup.minHashLshPairs(sigs, numBands = 4, rowsPerBand = 4, threshold = 0.5)
        .transform(graft.operators.Pin.lazyPin)
    }

  /** The documents-table TF-IDF stats (weighted postings + per-doc
    * norms), the round-13 persistable split: built once per (session,
    * dir) and shared by dd_tfidf_neardup and its parquet-round-trip twin
    * dd_tfidf_reload — the corpus-wide norm fold is paid once, never per
    * pair query. */
  private[graft] def sharedTfidfModel(s: SparkSession, dir: String): graft.operators.TfidfModel =
    memo(s, s"tfidfModel|$dir") {
      graft.operators.Dedup.tfidfStats(
        t(s, dir, "documents"), col("doc_id"), col("text"), shingleN = 3)
    }

  /** sim_ivf_topk / sim_hnsw_recall shard geometry: deterministic Lloyd,
    * 8 cells over the embeddings table — trained once per (session, dir). */
  private[graft] def sharedIvfCentroids(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    memo(s, s"ivfCents|$dir") {
      val e = t(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.deterministicCentroids(e, nCells = 8, iters = 6)
    }

  /** Capped (vocab 20, bigrams 400) documents bigram LM shared by six
    * registered queries; the three tiny tables (1 + 20 + 400 rows) pin. */
  private[graft] def sharedLm(s: SparkSession, dir: String): graft.operators.LanguageModel.BigramLm =
    memo(s, s"lm|$dir") {
      val lm = graft.operators.LanguageModel.trainBigramLm(
        t(s, dir, "documents"), col("text"), vocabSize = 20, maxBigrams = 400)
      graft.operators.LanguageModel.BigramLm(
        lm.stats.transform(graft.operators.Pin.lazyPin),
        lm.unigrams.transform(graft.operators.Pin.lazyPin),
        lm.bigrams.transform(graft.operators.Pin.lazyPin),
        lm.k)
    }

  // Decimal-exact sum of a double column, returned as double.
  private[graft] def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  // Driver-facing projection guard: the harness comparator canonicalizes
  // results through pandas, which cannot hash array/map/struct cells. Any
  // complex-typed output column ships as its JSON text here. The engine
  // outputs themselves stay nested — only these driver projections flatten.
  private[graft] def jsonSafe(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }


  // ------------------------------------------------------------------ oracles

  /** The MinHash coefficient table, interpolated into BOTH minhash oracles
    * (dd_minhash_lsh, tdp_build_corpus) so the SQL can never silently
    * desync from [[Dedup.hashA]]/[[Dedup.hashB]]. */
  private[graft] val minhashCoeffs: String =
    (0 until 16).map(i => s"(${i}, ${Dedup.hashA(i)}, ${Dedup.hashB(i)})").mkString(", ")

  /** The dd_minhash_lsh candidate-pair derivation as a reusable CTE chain
    * ending in `pairs(id_a, id_b)` (id_a < id_b, est_jaccard >= 0.5) —
    * the same chain the tdp_graph_rank / tdp_graph_triangles oracles
    * carry inline; shared by the round-10 graph oracles built over the
    * near-dup similarity graph. */
  private[graft] def lshPairCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_distinct(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
       |      ELSE [array_to_string(t, ' ')] END)) AS shingle
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
       |  FROM hs CROSS JOIN (SELECT * FROM (VALUES $minhashCoeffs) AS t(i, a, b)) co
       |  GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM mh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b,
       |    md5(s[4*b+1]::VARCHAR || ':' || s[4*b+2]::VARCHAR || ':' ||
       |        s[4*b+3]::VARCHAR || ':' || s[4*b+4]::VARCHAR) AS bh
       |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bands l JOIN bands r ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id),
       |est AS (
       |  SELECT id_a, id_b,
       |    sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
       |  FROM cand
       |  JOIN mh ma ON ma.doc_id = id_a
       |  JOIN mh mb ON mb.doc_id = id_b AND mb.i = ma.i
       |  GROUP BY id_a, id_b),
       |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5)""".stripMargin

  /** Symmetrized edges + degree/rank fixed point over [[lshPairCtes]]'s
    * `pairs` — the tdp_graph_rank iteration chain, reused by the
    * canonical-member oracle. Ends in `p3(id, deg, pr)`. */
  private[graft] def pageRankCtes: String =
    """,
      |sym AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT id_a AS src, id_b AS dst FROM pairs
      |    UNION ALL SELECT id_b, id_a FROM pairs)
      |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
      |nodes AS (SELECT src AS id, count(*)::BIGINT AS deg FROM sym GROUP BY src),
      |st AS (SELECT count(*)::BIGINT AS n FROM nodes),
      |p0 AS (SELECT id, deg, 1000000000000 // n AS pr FROM nodes CROSS JOIN st),
      |c1 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
      |       FROM p0 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
      |p1 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
      |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
      |       FROM p0 p LEFT JOIN c1 c ON c.id = p.id CROSS JOIN st),
      |c2 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
      |       FROM p1 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
      |p2 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
      |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
      |       FROM p1 p LEFT JOIN c2 c ON c.id = p.id CROSS JOIN st),
      |c3 AS (SELECT s.dst AS id, sum(p.pr // p.deg) AS sm
      |       FROM p2 p JOIN sym s ON s.src = p.id GROUP BY s.dst),
      |p3 AS (SELECT p.id, p.deg, (15 * 1000000000000) // (100 * st.n)
      |         + (85 * coalesce(c.sm, 0)) // 100 AS pr
      |       FROM p2 p LEFT JOIN c3 c ON c.id = p.id CROSS JOIN st),
      |labels AS (
      |  WITH RECURSIVE r(id, lab) AS (
      |    SELECT id, id FROM nodes
      |    UNION
      |    SELECT s.dst, r.lab FROM r JOIN sym s ON s.src = r.id)
      |  SELECT id, min(lab)::BIGINT AS component FROM r GROUP BY id)""".stripMargin

  /** One temp dir per (session, kind) for the sink-roundtrip queries —
    * both sinks write mode("overwrite"), so repeated bench/verify
    * invocations reuse one directory instead of accumulating orphans
    * under /tmp on long loops. A WeakHashMap keyed by session (like the
    * expression kernels' registration memos): stopped sessions — and
    * their dir strings — are GC-reclaimable instead of pinned for the
    * JVM lifetime across repeated bench/verify loops. */
  private[graft] val demoDirMemo =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, String]]()
  private[graft] def demoTempDir(s: org.apache.spark.sql.SparkSession, kind: String): String =
    demoDirMemo.synchronized {
      demoDirMemo.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(kind,
          java.nio.file.Files.createTempDirectory(s"graft-demo-$kind").toString)
    }

  /** Deterministic spectra synthesized from the embeddings table (shared by
    * dd_spectra_cluster / pipeline_native_cluster): planted near-copies at
    * +1000 (same precursor slot, +0.01 m/z) and second-generation copies at
    * +2000 (+0.03 m/z — within tol of the FIRST copy but NOT of the base,
    * so 3-member clusters close only transitively). Integer-valued
    * intensities make every dot/norm sum exact. Generations via explode,
    * NOT a self-union: unioning projections of the same scan trips
    * UnionBase.rewriteConstraints ("key not found") on constraints
    * referencing the pruned embedding column. */
  private[graft] def syntheticClusterSpectra(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    // vec_id < 1000 keeps the synthetic spec-id arithmetic (vec_id +
    // gen*1000) collision-free at EVERY SF — at sf0.1 the raw table has
    // 2000 vectors and base ids 1000+ would collide with the gen-1
    // copies (the one way an SF regeneration could redden this oracle;
    // scale evidence for the clusterer itself is ClusterBench at 500k)
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 1000)
    val tagged = emb.withColumn("gen", explode(
      when(col("vec_id") < 20, array(lit(0L), lit(1L), lit(2L)))
        .when(col("vec_id") < 60, array(lit(0L), lit(1L)))
        .otherwise(array(lit(0L)))))
    tagged.select(
      (col("vec_id") + col("gen") * lit(1000L)).as("specId"),
      (lit(2) + col("vec_id") % 2).cast("int").as("precursorCharge"),
      (lit(400.0) +
        floor(abs(element_at(col("embedding"), 1).cast("double")) * lit(20.0)) * lit(0.04) +
        when(col("gen") === 1, lit(0.01)).when(col("gen") === 2, lit(0.03))
          .otherwise(lit(0.0))).as("precursorMz"),
      transform(sequence(lit(0), lit(63)), i =>
        lit(100.0) + floor(i.cast("double") / lit(2.0)) * lit(2.0)).as("masses"),
      transform(sequence(lit(0), lit(63)), i =>
        round(abs(element_at(col("embedding"), i + lit(1)).cast("double")) * lit(1000.0)) +
          when(col("gen") === 1 && i % lit(9) === 0, lit(3.0))
            .when(col("gen") === 2 && i % lit(7) === 0, lit(4.0))
            .otherwise(lit(0.0))).as("intensities"))
  }

  /** Fixture corpus for the unigram/wordpiece tokenizer (round-12):
    * morphology-heavy so multi-character pieces emerge from EM. Fixed and
    * ASCII, so the Spark word-count head and the pure-Scala oracle-side
    * count BOTH resolve to the same table (binary string order ==
    * UTF-16 order on ASCII). */
  private[graft] val unigramFixtureCorpus: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "unhappiness unhappy happier happiest happiness",
    "kindness darkness brightness weakness sharpness",
    "running runner runs jumped jumping jumper",
    "tokenizer tokenize tokens token subword subwords",
    "scanning scanner scanned partition partitions partitioned",
    "the tokenizer runs over subword tokens quickly",
    "brightness of the quick brown tokenizer the tokens",
  )

  /** The fixture-trained unigram model, PURE Scala (no session) — safe to
    * reference at oracle-construction time; interpolated into the
    * txt_wordpiece_encode SQL. The in-query twin ([[sharedUnigramModel]])
    * trains through the DISTRIBUTED word-count head; any divergence
    * between the two paths reddens the driver row. */
  private[graft] lazy val unigramFixtureModel: graft.operators.Unigram.Model = {
    val counts = unigramFixtureCorpus
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, n) => (-n, w) }
    graft.operators.Unigram.trainFromCounts(counts, vocabSize = 80, maxPieceLen = 4)
  }

  /** Session memo of the same model trained via the Spark path. */
  private[graft] def sharedUnigramModel(s: SparkSession): graft.operators.Unigram.Model =
    memo(s, "unigramModel") {
      import s.implicits._
      val fx = unigramFixtureCorpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      graft.operators.Unigram.trainFromCounts(
        graft.operators.Unigram.wordCounts(fx, col("text")),
        vocabSize = 80, maxPieceLen = 4)
    }

  /** Deterministic REAL-IMAGE fixtures for the multimodal family
    * (round-12): per doc_id < `n`, a (8 + id%9) x (6 + id%7) gray8 raster
    * with pixel(x, y) = (id*31 + x*7 + y*13) % 256, encoded as an actual
    * PNG (`javax.imageio`). PNG is LOSSLESS, so the engine's real
    * ImageIO decode returns exactly the formula raster — which is what
    * lets the DuckDB oracle re-derive every decoded pixel from the
    * formula ([[mmPixelCtes]]) while the engine exercises a genuine
    * codec. Encoded per call (tiny images, partition-local). */
  private[graft] def syntheticImageRows(
      s: SparkSession, dir: String, n: Int): org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long].map { id =>
        val w = (8 + id % 9).toInt
        val h = (6 + id % 7).toInt
        val px = Array.tabulate(w * h)(j =>
          ((id * 31 + (j % w) * 7 + (j / w) * 13) % 256).toByte)
        graft.operators.Multimodal.MediaRow(
          id, "image", graft.operators.Multimodal.encodeGray(w, h, px),
          None, None, None)
      }
  }

  /** The fixture rasters re-derived in SQL: CTE `mpx(id, w, h, p)` with
    * `p` the row-major pixel list (1-based) — the oracle-side twin of
    * [[syntheticImageRows]]. */
  private[graft] def mmPixelCtes(n: Int): String =
    s"""mpx AS (
       |  SELECT doc_id AS id, (8 + doc_id % 9)::BIGINT AS w, (6 + doc_id % 7)::BIGINT AS h,
       |    list_transform(range((8 + doc_id % 9) * (6 + doc_id % 7)),
       |      j -> (doc_id*31 + (j % (8 + doc_id % 9))*7 + (j // (8 + doc_id % 9))*13) % 256) AS p
       |  FROM documents WHERE doc_id < $n)""".stripMargin

  /** Deterministic REAL-PCM audio fixtures (round-13, the
    * [[syntheticImageRows]] discipline for the audio lane): per doc_id <
    * `n`, 1000 little-endian int16 samples with
    * sample(t) = ((id·7 + t·13) % 4097) − 2048, PACKED AS ACTUAL PCM16LE
    * BYTES — the engine's [[graft.operators.Multimodal.pcm16Frames]]
    * exercises the genuine byte-level decode while the oracle re-derives
    * every sample from the formula ([[mmAudioCtes]]). */
  private[graft] def syntheticAudioRows(
      s: SparkSession, dir: String, n: Int): org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long].map { id =>
        val bytes = new Array[Byte](2000)
        var t0 = 0
        while (t0 < 1000) {
          val v = ((id * 7 + t0 * 13) % 4097).toInt - 2048
          bytes(2 * t0) = (v & 0xff).toByte
          bytes(2 * t0 + 1) = ((v >> 8) & 0xff).toByte
          t0 += 1
        }
        graft.operators.Multimodal.MediaRow(id, "audio", bytes, None, None, None)
      }
  }

  /** The fixture waveform re-derived in SQL: CTE `smp(id, t, s)`. */
  private[graft] def mmAudioCtes(n: Int): String =
    s"""smp AS (
       |  SELECT doc_id AS id, tt.range AS t,
       |    (doc_id * 7 + tt.range * 13) % 4097 - 2048 AS s
       |  FROM documents, range(0, 1000) tt WHERE doc_id < $n)""".stripMargin

  /** Deterministic REAL-WAV container fixtures (round-14, the container
    * layer over [[syntheticAudioRows]]'s bare-PCM lane): per doc_id <
    * `n`, doc_id % 4 == 3 ships the 1000-sample HEADERLESS raw-PCM
    * payload (the fallback path must coexist with parsed containers in
    * one corpus), every other id ships an ACTUAL RIFF/WAVE file —
    * `RIFF` size `WAVE`, a 16-byte `fmt ` chunk (PCM format 1,
    * channels = 1 + id%2, rate = 8000 + (id%3)·4000, bits 16), then a
    * JUNK `LIST` chunk of (id%7 + 1)·2 bytes sitting between fmt and
    * data (real encoders emit these; a parser that doesn't walk chunk
    * sizes lands mid-junk and goes red), then the `data` chunk with
    * m = 400 + (id%5)·30 frames of interleaved LE int16 samples,
    * sample(ch, t) = ((id·7 + t·13 + ch·5) % 4097) − 2048. Everything
    * the engine reads from the BYTES, the oracle re-derives from these
    * formulas ([[mmWavCtes]]). */
  private[graft] def syntheticWavRows(
      s: SparkSession, dir: String, n: Int): org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long].map { id =>
        val bytes =
          if (id % 4 == 3) {
            val b = new Array[Byte](2000)
            var t0 = 0
            while (t0 < 1000) {
              val v = ((id * 7 + t0 * 13) % 4097).toInt - 2048
              b(2 * t0) = (v & 0xff).toByte
              b(2 * t0 + 1) = ((v >> 8) & 0xff).toByte
              t0 += 1
            }
            b
          } else {
            val c = (1 + id % 2).toInt
            val rate = (8000 + (id % 3) * 4000).toInt
            val m = (400 + (id % 5) * 30).toInt
            val jl = ((id % 7) + 1).toInt * 2
            val dataLen = m * c * 2
            val bb = java.nio.ByteBuffer
              .allocate(12 + 24 + 8 + jl + 8 + dataLen)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 8 + jl + 8 + dataLen)
            bb.put("WAVE".getBytes("US-ASCII"))
            bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
            bb.putShort(1).putShort(c.toShort).putInt(rate).putInt(rate * c * 2)
            bb.putShort((c * 2).toShort).putShort(16)
            bb.put("LIST".getBytes("US-ASCII")).putInt(jl)
            (0 until jl).foreach(j => bb.put(((id + j) % 256).toByte))
            bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
            var t0 = 0
            while (t0 < m) {
              var ch = 0
              while (ch < c) {
                bb.putShort((((id * 7 + t0 * 13 + ch * 5) % 4097).toInt - 2048).toShort)
                ch += 1
              }
              t0 += 1
            }
            bb.array()
          }
        graft.operators.Multimodal.MediaRow(id, "audio", bytes, None, None, None)
      }
  }

  /** Deterministic REAL-AVI container fixtures (round-14, the video
    * lane's first genuine demux): per doc_id < `n`, doc_id % 5 == 4
    * ships an UNPARSEABLE payload (byte(j) = (id·11 + j·7) % 256,
    * length 150 + (id%4)·30, duration_ms = length — the stub-fallback
    * path must coexist), every other id ships an ACTUAL RIFF `AVI `
    * file: LIST hdrl with a real avih (µs/frame = 33000 + (id%3)·7000,
    * frame count nf = 6 + id%5, geometry 64+id%16 × 48+id%8), a JUNK
    * padding chunk of (id%5 + 1)·2 bytes (real muxers emit these), the
    * LIST movi with nf `00dc` chunks of fb = 20 + (id%3)·8 bytes each
    * — frame byte(f, j) = (id·17 + f·29 + j·3) % 256 — and a trailing
    * idx1 whose entries flag every f % 3 == 0 frame as a keyframe and
    * whose offsets are MOVI-RELATIVE for even ids but ABSOLUTE for odd
    * ids (both conventions ship in the wild; the parser's offset-base
    * heuristic must land every id on the same resolved offsets,
    * data_off(f) = 116 + jl + f·(8+fb), or go red). */
  private[graft] def syntheticAviRows(
      s: SparkSession, dir: String, n: Int): org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long].map { id =>
        if (id % 5 == 4) {
          val len = (150 + (id % 4) * 30).toInt
          val b = Array.tabulate[Byte](len)(j => ((id * 11 + j * 7) % 256).toByte)
          graft.operators.Multimodal.MediaRow(
            id, "video", b, None, None, Some(len.toLong))
        } else {
          val nf = (6 + id % 5).toInt
          val fb = (20 + (id % 3) * 8).toInt
          val usf = (33000 + (id % 3) * 7000).toInt
          val jl = ((id % 5) + 1).toInt * 2
          val w = (64 + id % 16).toInt
          val h = (48 + id % 8).toInt
          val moviData = nf * (8 + fb)
          val total = 12 + 76 + (8 + jl) + (12 + moviData) + (8 + nf * 16)
          val bb = java.nio.ByteBuffer.allocate(total)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
          bb.put("AVI ".getBytes("US-ASCII"))
          bb.put("LIST".getBytes("US-ASCII")).putInt(68).put("hdrl".getBytes("US-ASCII"))
          bb.put("avih".getBytes("US-ASCII")).putInt(56)
          bb.putInt(usf).putInt(0).putInt(0).putInt(0x10 /* AVIF_HASINDEX */)
          bb.putInt(nf).putInt(0).putInt(1).putInt(0).putInt(w).putInt(h)
          bb.putInt(0).putInt(0).putInt(0).putInt(0)
          bb.put("JUNK".getBytes("US-ASCII")).putInt(jl)
          (0 until jl).foreach(j => bb.put(((id + j) % 256).toByte))
          bb.put("LIST".getBytes("US-ASCII")).putInt(4 + moviData)
            .put("movi".getBytes("US-ASCII"))
          val moviFourccPos = 12 + 76 + 8 + jl + 8
          (0 until nf).foreach { f =>
            bb.put("00dc".getBytes("US-ASCII")).putInt(fb)
            (0 until fb).foreach(j => bb.put(((id * 17 + f * 29 + j * 3) % 256).toByte))
          }
          bb.put("idx1".getBytes("US-ASCII")).putInt(nf * 16)
          (0 until nf).foreach { f =>
            val hdrRel = 4 + f * (8 + fb)
            bb.put("00dc".getBytes("US-ASCII"))
            bb.putInt(if (f % 3 == 0) 0x10 else 0)
            bb.putInt(if (id % 2 == 0) hdrRel else moviFourccPos + hdrRel)
            bb.putInt(fb)
          }
          graft.operators.Multimodal.MediaRow(id, "video", bb.array(), None, None, None)
        }
      }
  }

  /** The AVI fixture's layout re-derived in SQL: CTE `afx(id, raw, nf,
    * fb, usf, jl, len)` — the oracle-side twin of [[syntheticAviRows]]
    * (container data_off(f) = 116 + jl + f·(8+fb); fallback payload
    * length `len`). */
  private[graft] def mmAviCtes(n: Int): String =
    s"""afx AS (
       |  SELECT doc_id AS id, doc_id % 5 = 4 AS raw,
       |    (6 + doc_id % 5)::BIGINT AS nf,
       |    (20 + (doc_id % 3) * 8)::BIGINT AS fb,
       |    (33000 + (doc_id % 3) * 7000)::BIGINT AS usf,
       |    ((doc_id % 5 + 1) * 2)::BIGINT AS jl,
       |    (150 + (doc_id % 4) * 30)::BIGINT AS len
       |  FROM documents WHERE doc_id < $n)""".stripMargin

  /** The WAV fixture's layout re-derived in SQL: CTE `wfx(id, raw, c,
    * rate, m, jl)` — the oracle-side twin of [[syntheticWavRows]]
    * (data_offset = 12 + 24 + 8 + jl + 8 = 52 + jl for containers). */
  private[graft] def mmWavCtes(n: Int): String =
    s"""wfx AS (
       |  SELECT doc_id AS id, doc_id % 4 = 3 AS raw,
       |    (1 + doc_id % 2)::BIGINT AS c,
       |    (8000 + (doc_id % 3) * 4000)::BIGINT AS rate,
       |    (400 + (doc_id % 5) * 30)::BIGINT AS m,
       |    ((doc_id % 7 + 1) * 2)::BIGINT AS jl
       |  FROM documents WHERE doc_id < $n)""".stripMargin

  private[graft] val nativeClusterConfig = graft.operators.SpectraCluster.Config(
    binWidth = 1.0, topPeaks = 20, candidateBins = 6,
    precursorTol = 0.02, minCosine = 0.95, maxCandidateKeyDf = 0L)

  /** Shared DuckDB re-derivation of the native spectra clustering
    * (synthesis -> binning -> candidate join -> cosine edges ->
    * recursive min-label components): CTE chain ending at `labels
    * (spec_id, cluster_id)` — consumers append their own final
    * SELECT (dd_spectra_cluster) or further CTEs
    * (pipeline_native_cluster). */
  private[graft] val spectraClusterLabelCtes: String =
    """WITH base AS (
        |  SELECT vec_id AS spec_id,
        |    (2 + vec_id % 2)::INTEGER AS charge,
        |    400.0 + floor(abs(embedding[1]::DOUBLE) * 20.0) * 0.04 + 0.0 AS pmz,
        |    list_transform(range(64), i -> round(abs(embedding[i+1]::DOUBLE) * 1000.0)) AS inten
        |  FROM embeddings WHERE vec_id < 1000),
        |copies AS (
        |  SELECT vec_id + 1000 AS spec_id,
        |    (2 + vec_id % 2)::INTEGER AS charge,
        |    400.0 + floor(abs(embedding[1]::DOUBLE) * 20.0) * 0.04 + 0.01 AS pmz,
        |    list_transform(range(64), i -> round(abs(embedding[i+1]::DOUBLE) * 1000.0)
        |      + CASE WHEN i % 9 = 0 THEN 3.0 ELSE 0.0 END) AS inten
        |  FROM embeddings WHERE vec_id < 60),
        |copies2 AS (
        |  SELECT vec_id + 2000 AS spec_id,
        |    (2 + vec_id % 2)::INTEGER AS charge,
        |    400.0 + floor(abs(embedding[1]::DOUBLE) * 20.0) * 0.04 + 0.03 AS pmz,
        |    list_transform(range(64), i -> round(abs(embedding[i+1]::DOUBLE) * 1000.0)
        |      + CASE WHEN i % 7 = 0 THEN 4.0 ELSE 0.0 END) AS inten
        |  FROM embeddings WHERE vec_id < 20),
        |spec AS (SELECT * FROM base UNION ALL SELECT * FROM copies UNION ALL SELECT * FROM copies2),
        |peaks AS (
        |  SELECT spec_id, charge, pmz, 100 + 2 * (i // 2) AS bin, inten[i+1] AS x
        |  FROM spec CROSS JOIN (SELECT unnest(range(64)) AS i)),
        |binsall AS (
        |  SELECT spec_id, charge, pmz, bin, sum(x) AS w FROM peaks
        |  WHERE x > 0 GROUP BY spec_id, charge, pmz, bin),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY spec_id ORDER BY w DESC, bin ASC) AS r
        |  FROM binsall),
        |topk AS (SELECT * FROM ranked WHERE r <= 20),
        |norms AS (SELECT spec_id, sqrt(sum(w * w)) AS nrm FROM topk GROUP BY spec_id),
        |cand AS (
        |  SELECT DISTINCT a.spec_id AS id_a, b.spec_id AS id_b
        |  FROM topk a JOIN topk b
        |    ON a.charge = b.charge AND a.bin = b.bin AND a.spec_id < b.spec_id
        |   AND abs(a.pmz - b.pmz) <= 0.02
        |  WHERE a.r <= 6 AND b.r <= 6),
        |dots AS (
        |  SELECT c.id_a, c.id_b, sum(a.w * b.w) AS dot
        |  FROM cand c JOIN topk a ON a.spec_id = c.id_a
        |  JOIN topk b ON b.spec_id = c.id_b AND b.bin = a.bin
        |  GROUP BY c.id_a, c.id_b),
        |edges AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cosine
        |    FROM dots d JOIN norms na ON na.spec_id = d.id_a
        |    JOIN norms nb ON nb.spec_id = d.id_b)
        |  WHERE cosine >= 0.95),
        |sym AS (SELECT id_a AS u, id_b AS v FROM edges
        |        UNION ALL SELECT id_b, id_a FROM edges),
        |labels AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT spec_id, spec_id FROM spec
        |    UNION
        |    SELECT s.v, r.lab FROM r JOIN sym s ON s.u = r.id)
        |  SELECT id AS spec_id, min(lab) AS cluster_id FROM r GROUP BY id)""".stripMargin

  private[graft] val simhashSums: String =
    (0 until 32).map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j").mkString(", ")

  private[graft] val simhashValue: String =
    (0 until 32).map(j => s"CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")

  private[graft] val usiCharClass = """[()_ =&$@;+?{^}%\]>\[~<#|]"""

  /** Stupid-backoff bigram-LM score re-derivation, parameterized over the
    * (id, text) relation and the model caps — shared by the SF query and
    * its inline-fixture twin. */
  /** The bigram-LM CTE chain through per-doc `agg` (shared by
    * txt_lm_score and the quality-ensemble oracle). */
  private[graft] def lmScoreCtes(docsFrom: String, vocabCap: Int, bigramCap: Int): String =
    s"""WITH d AS (
       |  SELECT id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM $docsFrom),
       |uni_all AS (
       |  SELECT term, count(*)::BIGINT AS c
       |  FROM (SELECT unnest(t) AS term FROM d) GROUP BY term),
       |st AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_tok, count(*)::BIGINT AS v
       |       FROM uni_all),
       |uni AS (SELECT term, c FROM uni_all ORDER BY c DESC, term LIMIT $vocabCap),
       |bi AS (
       |  SELECT w1, w2, count(*)::BIGINT AS c FROM (
       |    SELECT t[i-1] AS w1, t[i] AS w2
       |    FROM d, LATERAL unnest(generate_series(2, len(t))) AS g(i))
       |  GROUP BY w1, w2 ORDER BY c DESC, w1, w2 LIMIT $bigramCap),
       |pos AS (
       |  SELECT id, i, t[i] AS term, CASE WHEN i > 1 THEN t[i-1] END AS prev
       |  FROM d, LATERAL unnest(generate_series(1, len(t))) AS g(i)),
       |sc AS (
       |  SELECT p.id,
       |    round(-ln(CASE WHEN p.i = 1
       |        THEN (coalesce(u.c, 0) + 0.5::DOUBLE)
       |             / (st.n_tok + 0.5::DOUBLE * (st.v + 1))
       |      WHEN bp.c IS NOT NULL AND up.c IS NOT NULL
       |        THEN bp.c::DOUBLE / up.c::DOUBLE
       |      ELSE 0.4::DOUBLE * ((coalesce(u.c, 0) + 0.5::DOUBLE)
       |             / (st.n_tok + 0.5::DOUBLE * (st.v + 1)))
       |      END), 6)::DECIMAL(28,6) AS nl
       |  FROM pos p
       |  LEFT JOIN uni u ON u.term = p.term
       |  LEFT JOIN uni up ON up.term = p.prev
       |  LEFT JOIN bi bp ON bp.w1 = p.prev AND bp.w2 = p.term
       |  CROSS JOIN st),
       |agg AS (SELECT id, count(*)::BIGINT AS n_tokens, sum(nl) AS s,
       |          (sum(nl) * 1000000)::BIGINT AS u
       |        FROM sc GROUP BY id)""".stripMargin

  private[graft] def lmScoreSql(docsFrom: String, vocabCap: Int, bigramCap: Int): String =
    lmScoreCtes(docsFrom, vocabCap, bigramCap) +
      """
        |SELECT d.id AS doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  ((a.u * 2 + a.n_tokens) // (a.n_tokens * 2))::DOUBLE / 1000000 AS lm_score
        |FROM d LEFT JOIN agg a ON d.id = a.id
        |ORDER BY doc_id""".stripMargin

  private[graft] val dotSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1,65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)), (a,b) -> a+b)"
  private[graft] def normSql(v: String) =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform(range(1,65), i -> $v[i]::DOUBLE * $v[i]::DOUBLE)), (a,b) -> a+b))"
  // prefix-fold variants over the first n components (matryoshka stage 1)
  private[graft] def dotPreSql(n: Int) =
    s"list_reduce(list_prepend(0.0, list_transform(range(1,${n + 1}), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)), (a,b) -> a+b)"
  private[graft] def normPreSql(v: String, n: Int) =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform(range(1,${n + 1}), i -> $v[i]::DOUBLE * $v[i]::DOUBLE)), (a,b) -> a+b))"

  // Rademacher random projection (VectorFunctions.randomProjection) —
  // same md5-sign derivation, same sequential per-component fold, same
  // trailing scale multiply, so projected vectors replay bit-identically.
  private[graft] def rpProjSql(v: String, inDim: Int = 64, outDim: Int = 16): String = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    s"list_transform(range(1,${outDim + 1}), j -> " +
      s"list_reduce(list_prepend(0.0, list_transform(range(1,${inDim + 1}), i -> " +
      s"$v[i]::DOUBLE * (CASE WHEN ('0x' || substr(md5('rp:' || (j-1)::VARCHAR || " +
      s"':' || (i-1)::VARCHAR), 1, 8))::BIGINT >= 2147483648 THEN 1.0 ELSE -1.0 END))), " +
      s"(a,b) -> a+b) * '${scale}'::DOUBLE)"
  }

  // Random-hyperplane projection for plane p, bit-identical to
  // VectorFunctions.hyperplaneComponent / hyperplaneBit (md5-derived
  // components, same sequential fold order).
  private[graft] def hpProjSql(p: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1,65), i -> vec[i]::DOUBLE * " +
      s"(('0x' || substr(md5('hp:$p:' || (i-1)::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0 - 0.5))), (a,b) -> a+b)"
  private[graft] val lshBucketSql: String =
    (0 until 4).map(p => s"(CASE WHEN ${hpProjSql(p)} >= 0.0 THEN ${1L << p} ELSE 0 END)")
      .mkString(" + ")

  // Shared expected table: deterministic centroids make the one-shot and
  // disk-backed IVF paths value-identical.
  private[graft] val IvfExpectedSql: String =
    """SELECT c0::BIGINT AS "query_id", c1::BIGINT AS "neighbor_id", c2::DOUBLE AS "cosine", c3::INTEGER AS "rank" FROM (VALUES (0, 365, '0.3699935965460897'::DOUBLE, 1), (0, 387, '0.33113871888314317'::DOUBLE, 2), (0, 423, '0.2969335986409863'::DOUBLE, 3), (0, 73, '0.29543411523164853'::DOUBLE, 4), (0, 320, '0.2878605122093518'::DOUBLE, 5), (1, 386, '0.37148454183744223'::DOUBLE, 1), (1, 27, '0.3482081864636984'::DOUBLE, 2), (1, 407, '0.3270099496117245'::DOUBLE, 3), (1, 195, '0.32274442635213746'::DOUBLE, 4), (1, 64, '0.3163742953318501'::DOUBLE, 5), (2, 117, '0.318142564237661'::DOUBLE, 1), (2, 450, '0.26634395520019954'::DOUBLE, 2), (2, 188, '0.263272104561668'::DOUBLE, 3), (2, 418, '0.25402949645206835'::DOUBLE, 4), (2, 471, '0.24719275246584027'::DOUBLE, 5), (3, 130, '0.39987234325628024'::DOUBLE, 1), (3, 343, '0.30847165466962984'::DOUBLE, 2), (3, 174, '0.30354804540607316'::DOUBLE, 3), (3, 231, '0.29878836545413046'::DOUBLE, 4), (3, 207, '0.29170184705661967'::DOUBLE, 5), (4, 114, '0.39851269358433744'::DOUBLE, 1), (4, 496, '0.34121178056570023'::DOUBLE, 2), (4, 408, '0.32275312529105415'::DOUBLE, 3), (4, 482, '0.31389702932135605'::DOUBLE, 4), (4, 280, '0.27982608680315935'::DOUBLE, 5), (5, 404, '0.32840296338035546'::DOUBLE, 1), (5, 419, '0.31923743304166513'::DOUBLE, 2), (5, 157, '0.31125602484760423'::DOUBLE, 3), (5, 33, '0.3109867269549467'::DOUBLE, 4), (5, 359, '0.3058210572054561'::DOUBLE, 5), (6, 430, '0.32252026548071816'::DOUBLE, 1), (6, 145, '0.2976957384094014'::DOUBLE, 2), (6, 214, '0.2569408403316626'::DOUBLE, 3), (6, 252, '0.255629792758746'::DOUBLE, 4), (6, 374, '0.24757953117255718'::DOUBLE, 5), (7, 340, '0.4927657135003488'::DOUBLE, 1), (7, 425, '0.4075199341921925'::DOUBLE, 2), (7, 209, '0.3944625171493481'::DOUBLE, 3), (7, 334, '0.3569014029689115'::DOUBLE, 4), (7, 445, '0.34078247055145644'::DOUBLE, 5), (8, 39, '0.384696274117943'::DOUBLE, 1), (8, 138, '0.35667116396668896'::DOUBLE, 2), (8, 403, '0.3382375201415271'::DOUBLE, 3), (8, 380, '0.3045263882069312'::DOUBLE, 4), (8, 447, '0.28074172053081703'::DOUBLE, 5), (9, 49, '0.38517053208433855'::DOUBLE, 1), (9, 107, '0.2844935027707189'::DOUBLE, 2), (9, 259, '0.2514843841938669'::DOUBLE, 3), (9, 302, '0.24766351404606549'::DOUBLE, 4), (9, 319, '0.24190310903970472'::DOUBLE, 5)) AS t(c0, c1, c2, c3) ORDER BY "query_id", "rank""""


  /** Live SQL re-derivations for the VALUES-pinned oracles (round-8 oracle
    * policy, VERDICT r7 item 1): each pinned query keeps its full DuckDB
    * re-derivation HERE, replayed by tools/check_oracle.py in the local
    * environment only. The driver-facing oracle (oracleSql) is the
    * reviewed VALUES pin in [[PinnedOracles]] — environment-proof because
    * it re-states the verified output instead of re-deriving ln/log2
    * contributions in whatever libm the gate's DuckDB links (two rounds
    * of last-digit flips at 9 dp; see gen_pins.py header). The pin proves
    * environment-independence; this map keeps proving the logic.
    */
  /** Boilerplate-scrub re-derivation: positional line explode, distinct
    * document frequencies, the ceil(frac * n) threshold, NOT EXISTS
    * anti-join, ordered string_agg rebuild — mirror of
    * Curation.removeBoilerplateLines term for term. `sepSql` is a SQL
    * expression for the separator (e.g. "' '" or "chr(10)"). */
  private[graft] def boilerplateScrubSql(docsFrom: String, sepSql: String, frac: Double): String =
    s"""WITH d AS (SELECT id, text FROM $docsFrom),
       |n AS (SELECT count(*)::BIGINT AS n_docs FROM d),
       |l AS (
       |  SELECT id, i, L[i] AS line
       |  FROM (SELECT id, string_split(text, $sepSql) AS L FROM d),
       |  LATERAL unnest(generate_series(1, len(L))) AS g(i)),
       |dfc AS (SELECT line, count(DISTINCT id)::BIGINT AS df FROM l GROUP BY line),
       |boiler AS (
       |  SELECT line FROM dfc CROSS JOIN n
       |  WHERE df >= ceil('$frac'::DOUBLE * n_docs::DOUBLE)),
       |keep AS (
       |  SELECT id, i, line FROM l
       |  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.line = l.line)),
       |reb AS (
       |  SELECT id, count(*)::BIGINT AS n_kept,
       |    string_agg(line, $sepSql ORDER BY i) AS text_clean
       |  FROM keep GROUP BY id),
       |tot AS (SELECT id, len(string_split(text, $sepSql))::BIGINT AS n_lines FROM d)
       |SELECT t.id AS doc_id, t.n_lines,
       |  t.n_lines - coalesce(r.n_kept, 0) AS n_removed,
       |  coalesce(r.text_clean, '') AS text_clean
       |FROM tot t LEFT JOIN reb r ON r.id = t.id
       |ORDER BY doc_id""".stripMargin

  /** Quality-ensemble re-derivation: the shared LM CTE chain, the
    * txt_quality heuristic CASE, the txt_quality_model hashed sum, then
    * 20-bin per-signal CDF calibration and the fixed weighted mean —
    * every arithmetic step mirrors the Scala columns term for term. */
  private[graft] def ensembleCtes: String =
    lmScoreCtes("(SELECT doc_id AS id, text FROM documents)", 20, 400) +
      s""",
        |lmsc AS (
        |  SELECT d.id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |    ((a.u * 2 + a.n_tokens) // (a.n_tokens * 2))::DOUBLE / 1000000 AS lm_score
        |  FROM d LEFT JOIN agg a ON d.id = a.id),
        |hm AS (
        |  SELECT doc_id AS id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |hq AS (
        |  SELECT id, coalesce(
        |    (CASE WHEN len(toks) >= 10 AND len(toks) <= 10000
        |          THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) * 0.4::DOUBLE
        |    + (CASE WHEN len(list_filter(toks,
        |          t -> t IN ('the','a','of','and','to','in','is','that')))::DOUBLE
        |          / len(toks) > 0.02 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN (len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
        |          / len(text) < 0.2 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END),
        |    0.0::DOUBLE) AS q_heuristic
        |  FROM hm),
        |qtok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |qb AS (SELECT doc_id,
        |        [${graft.operators.QualityModel.weightsMilli.mkString(", ")}]
        |          [((('0x' || substr(md5(t), 1, 8))::BIGINT % 64) + 1)::INT] AS w
        |      FROM qtok),
        |qs AS (SELECT doc_id, sum(w)::BIGINT AS sw, count(*)::BIGINT AS n FROM qb GROUP BY doc_id),
        |qm AS (
        |  SELECT d0.doc_id AS id,
        |    CASE WHEN s.n IS NULL OR s.n = 0 THEN 0.0
        |         ELSE sw::DOUBLE / 1000.0 / n END AS q_model
        |  FROM documents d0 LEFT JOIN qs s ON d0.doc_id = s.doc_id),
        |sigj AS (
        |  SELECT l.id, l.n_tokens, h.q_heuristic, q.q_model, l.lm_score
        |  FROM lmsc l JOIN hq h USING (id) JOIN qm q USING (id)),
        |binned AS (
        |  SELECT *,
        |    least(19, greatest(0,
        |      floor((q_heuristic - 0.0::DOUBLE) * 20.0::DOUBLE / 1.0::DOUBLE)::INT)) AS bh,
        |    least(19, greatest(0,
        |      floor((q_model - '-1.0'::DOUBLE) * 20.0::DOUBLE / 2.0::DOUBLE)::INT)) AS bm,
        |    CASE WHEN lm_score IS NOT NULL THEN least(19, greatest(0,
        |      floor((lm_score - 0.0::DOUBLE) * 20.0::DOUBLE / 16.0::DOUBLE)::INT)) END AS bl
        |  FROM sigj),
        |hist AS (
        |  SELECT sig_i, bin, count(*)::BIGINT AS n FROM (
        |    SELECT 0 AS sig_i, bh AS bin FROM binned
        |    UNION ALL SELECT 1, bm FROM binned
        |    UNION ALL SELECT 2, bl FROM binned)
        |  WHERE bin IS NOT NULL GROUP BY sig_i, bin),
        |cdfq AS (
        |  SELECT sig_i, bin,
        |    (sum(n) OVER (PARTITION BY sig_i ORDER BY bin ROWS UNBOUNDED PRECEDING))::DOUBLE
        |      / (sum(n) OVER (PARTITION BY sig_i))::DOUBLE AS cdf
        |  FROM hist),
        |ens AS (
        |  SELECT b.id AS doc_id, b.n_tokens, b.q_heuristic, b.q_model, b.lm_score,
        |    ch.cdf AS cal_heuristic, cm.cdf AS cal_model, cl.cdf AS cal_lm,
        |    0.25::DOUBLE * ch.cdf + 0.35::DOUBLE * cm.cdf
        |      + 0.40::DOUBLE * (1.0::DOUBLE - cl.cdf) AS ensemble
        |  FROM binned b
        |  LEFT JOIN cdfq ch ON ch.sig_i = 0 AND ch.bin = b.bh
        |  LEFT JOIN cdfq cm ON cm.sig_i = 1 AND cm.bin = b.bm
        |  LEFT JOIN cdfq cl ON cl.sig_i = 2 AND cl.bin = b.bl)""".stripMargin

  private[graft] def qualityEnsembleSql: String =
    ensembleCtes + """
      |SELECT doc_id, n_tokens, q_heuristic, q_model, lm_score,
      |  cal_heuristic, cal_model, cal_lm, ensemble
      |FROM ens ORDER BY doc_id""".stripMargin

  /** The ensemble driven through calibrationReport (same bucket math and
    * 9-dp round-then-decimal mean as the dq_calibration oracle). Lives in
    * rederiveSql only: its text mixes the LM ln() with the calibration
    * contract's round(.., 9), the exact combination the round-8 lint
    * forbids in a live oracle — so the shipped oracle is a VALUES pin. */
  private[graft] def ensembleCalibrationSql: String =
    ensembleCtes + """,
      |j AS (
      |  SELECT ensemble AS sv, (q_heuristic >= 1.0::DOUBLE) AS y FROM ens
      |  WHERE ensemble IS NOT NULL AND q_heuristic IS NOT NULL),
      |g AS (
      |  SELECT least(9, greatest(0,
      |      floor((sv - 0.0::DOUBLE) * 10.0::DOUBLE / 1.0::DOUBLE)::INT)) AS bucket,
      |    count(*)::BIGINT AS n, sum(y::INT)::BIGINT AS n_pos,
      |    sum(round(sv, 9)::DECIMAL(28,9))::DOUBLE / count(*)::DOUBLE AS mean_score
      |  FROM j GROUP BY 1)
      |SELECT bucket, n, n_pos, mean_score,
      |  n_pos::DOUBLE / n::DOUBLE AS pos_rate
      |FROM g ORDER BY bucket""".stripMargin

}
