package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operators: priority sampling (exact-n weighted, unbiased
  * subset-sum weights), Fleiss' kappa (fixed-panel many-rater agreement),
  * and their edge behavior. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // driver-side reference priority: w / ((h + 1) / 2^32), h = 32-bit md5 prefix
  private def refPriority(key: String, w: Double): Double =
    w / ((java.lang.Long.parseLong(md5hex(key).take(8), 16).toDouble + 1.0) / 4294967296.0)

  test("prioritySample equals the flat top-n by reference priority, tau exact") {
    val rows = (0 until 400).map(i => (i.toLong, s"s${i % 5}", (i % 97 + 1).toLong))
    val df = rows.toDF("id", "src", "w")
    val n = 50
    val got = graft.operators.Curation.prioritySample(df, col("id"), col("w"), n.toLong)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    val ranked = rows
      .map { case (id, _, w) => (id, w.toDouble, refPriority(id.toString, w.toDouble)) }
      .sortBy { case (id, _, q) => (-q, id.toString) }
    val tau = ranked(n)._3 // the (n+1)-th priority
    val want = ranked.take(n)
      .map { case (id, w, q) => (id, q, math.max(w, tau)) }
      .sortBy(_._1)
    assert(got.length == n)
    assert(got.toSeq == want)
  }

  test("prioritySample exhaustive case: population <= n keeps all, est_weight = weight") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
    val got = graft.operators.Curation.prioritySample(df, col("id"), col("w"), 10L)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("prioritySamplePerGroup: exactly k per big group, per-group tau, small groups whole") {
    // group "a": 100 rows; group "b": 3 rows (< k -> whole, tau 0)
    val rows = (0 until 100).map(i => (i.toLong, "a", (i % 11 + 1).toLong)) ++
      Seq((200L, "b", 5L), (201L, "b", 6L), (202L, "b", 7L))
    val df = rows.toDF("id", "src", "w")
    val k = 10
    val got = graft.operators.Curation.prioritySamplePerGroup(
      df, col("src"), col("id"), col("w"), k)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(4))).toSeq
    val a = got.filter(_._1 == "a")
    val b = got.filter(_._1 == "b")
    assert(a.length == k && b.length == 3)
    // per-group tau for "a" = the 11th reference priority inside "a"
    val rankedA = rows.filter(_._2 == "a")
      .map { case (id, _, w) => (id, w.toDouble, refPriority(id.toString, w.toDouble)) }
      .sortBy { case (id, _, q) => (-q, id.toString) }
    val tauA = rankedA(k)._3
    val wantA = rankedA.take(k).map { case (id, w, _) => (id, math.max(w, tauA)) }.toMap
    a.foreach { case (_, id, est) => assert(est == wantA(id), s"est for a/$id") }
    // small group ships exact weights (tau 0)
    assert(b.map(x => (x._2, x._3)).toSet == Set((200L, 5.0), (201L, 6.0), (202L, 7.0)))
  }

  test("prioritySample excludes NULL keys and non-positive weights") {
    val df = Seq((Some(1L), 10L), (None, 10L), (Some(2L), 0L), (Some(3L), -5L))
      .toDF("id", "w")
    val got = graft.operators.Curation.prioritySample(df, col("id"), col("w"), 10L)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("prioritySample est_weight is exactly max(weight, tau) with the reference tau") {
    val rows = (0 until 300).map(i => (i.toLong, (i % 13 + 1).toLong))
    val df = rows.toDF("id", "w")
    val n = 40
    val out = graft.operators.Curation.prioritySample(df, col("id"), col("w"), n.toLong)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ranked = rows
      .map { case (id, w) => (id, w.toDouble, refPriority(id.toString, w.toDouble)) }
      .sortBy { case (id, _, q) => (-q, id.toString) }
    val tau = ranked(n)._3
    assert(out.length == n)
    out.foreach { case (id, w, q, est) =>
      assert(q == refPriority(id.toString, w.toDouble), s"priority for id=$id")
      assert(est == math.max(w.toDouble, tau), s"est_weight for id=$id")
    }
  }

  test("fleissKappa matches the hand formula on the Fleiss 1971 textbook shape") {
    // 4 items x 3 raters, 3 categories; hand-computed:
    // item cells: i1 = (a:3), i2 = (a:2, b:1), i3 = (b:2, c:1), i4 = (a:1, b:1, c:1)
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "c"),
      (4L, "a"), (4L, "b"), (4L, "c"))
    val df = ratings.toDF("item", "cat")
    val r = graft.operators.DataQuality.fleissKappa(df, col("item"), col("cat"), 3)
      .collect().head
    val s2 = 9.0 + (4 + 1) + (4 + 1) + (1 + 1 + 1) // sum n_ij^2 = 22
    val total = 12.0
    val pBar = (s2 - total) / (total * 2) // N*n*(n-1) = 4*3*2 = 24
    val c2 = 6.0 * 6 + 4 * 4 + 2 * 2 // c_a=6, c_b=4, c_c=2 -> 56
    val pE = c2 / (total * total)
    val kappa = (pBar - pE) / (1.0 - pE)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == pBar && r.getDouble(3) == pE && r.getDouble(4) == kappa)
  }

  test("fleissKappa excludes ragged items and is NULL-kappa on a single category") {
    val df = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"), (3L, "x"))
      .toDF("item", "cat") // item 3 has 1 rating -> excluded
    val r = graft.operators.DataQuality.fleissKappa(df, col("item"), col("cat"), 2)
      .collect().head
    assert(r.getLong(0) == 2L)         // items 1, 2 kept
    assert(r.getDouble(2) == 1.0)      // perfect agreement
    assert(r.getDouble(3) == 1.0)      // chance agreement total
    assert(r.isNullAt(4))              // kappa undefined
  }

  test("fleissKappa empty panel emits the zero row with NULL stats") {
    val df = Seq((1L, "x")).toDF("item", "cat") // no item reaches n=3
    val r = graft.operators.DataQuality.fleissKappa(df, col("item"), col("cat"), 3)
      .collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("kCore peels a star but keeps the triangle, with in-core degrees") {
    // triangle 1-2-3 + star 3->{4,5,6} + tail 6-7: 2-core = the triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (3L, 5L), (3L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Graph.kCore(pairs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore multi-round peel: a long tail needs one round per link") {
    // path 10-11-12-13-14 hanging off square 1-2-3-4(-1): each peel round
    // removes exactly one tail node, so convergence takes 5+ rounds
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val tail = Seq((1L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
    val got = graft.operators.Graph.kCore((square ++ tail).toDF("id_a", "id_b"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("kCore empty core, duplicate/self-loop hygiene, k=1 keeps every edge endpoint") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    // k=3: nothing survives
    assert(graft.operators.Graph.kCore(pairs, 3).count() == 0)
    // k=1: all endpoints, dup pair collapsed (deg(1)=1, deg(2)=2, deg(3)=1)
    val k1 = graft.operators.Graph.kCore(pairs, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(k1 == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("scaledScatter equals the driver-side reference on quantized vectors") {
    import graft.operators.Pca
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f)),
      (2L, Array(-1.5f, 0.75f, 0.125f)),
      (3L, Array(0.0f, 2.0f, -0.5f)))
    val df = vecs.toDF("id", "v")
    val got = Pca.scaledScatter(df, col("v"), dim = 3)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt),
        BigInt(r.getDecimal(2).toBigInteger).toLong)).toMap
    val q = vecs.map(_._2.map(x => math.floor(x.toDouble * 1000.0).toLong))
    val n = q.length.toLong
    for (i <- 0 until 3; j <- i until 3) {
      val pij = q.map(r => r(i) * r(j)).sum
      val mi = q.map(_(i)).sum
      val mj = q.map(_(j)).sum
      assert(got((i, j)) == n * pij - mi * mj, s"S($i,$j)")
    }
    // ragged and null rows are excluded, not corrupting
    val ragged = (vecs.map { case (id, v) => (id, Option(v)) } :+
      (4L, Option(Array(1.0f))) :+ (5L, Option.empty[Array[Float]])).toDF("id", "v")
    val g2 = Pca.scaledScatter(ragged, col("v"), dim = 3)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt),
        BigInt(r.getDecimal(2).toBigInteger).toLong)).toMap
    assert(g2 == got)
  }

  test("scatterStats merge is exactly additive, including an empty batch") {
    import graft.operators.Pca
    val vecs = (0 until 20).map(i => (i.toLong, Array.tabulate(4)(d => (i * 3 + d).toFloat / 7f)))
    val df = vecs.toDF("id", "v")
    val direct = Pca.scaledScatter(df, col("v"), 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), BigInt(r.getDecimal(2).toBigInteger))).toMap
    val merged = Pca.scatterFromStats(Pca.mergeStats(
      Pca.scatterStats(df.filter(col("id") % 2 === 0), col("v"), 4),
      Pca.scatterStats(df.filter(col("id") % 2 === 1), col("v"), 4)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), BigInt(r.getDecimal(2).toBigInteger))).toMap
    assert(merged == direct)
    // merging an EMPTY batch is the identity
    val withEmpty = Pca.scatterFromStats(Pca.mergeStats(
      Pca.scatterStats(df, col("v"), 4),
      Pca.scatterStats(df.filter(col("id") < 0), col("v"), 4)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), BigInt(r.getDecimal(2).toBigInteger))).toMap
    assert(withEmpty == direct)
  }

  test("principalDirectionFixedPoint finds the dominant axis of a diagonal matrix") {
    import graft.operators.Pca
    // diag(100, 10, 1): power iteration pins component 0 at 1e6 and the
    // rest decay by 10x per step
    val s = Array(
      Array(BigInt(100), BigInt(0), BigInt(0)),
      Array(BigInt(0), BigInt(10), BigInt(0)),
      Array(BigInt(0), BigInt(0), BigInt(1)))
    val v = Pca.principalDirectionFixedPoint(s, iters = 4)
    assert(v(0) == 1000000L)
    assert(v(1) == 100L)    // (1/10)^4 * 1e6
    assert(v(2) == 0L)      // (1/100)^4 * 1e6 truncates to 0
  }

  test("projectPrincipal is the exact integer fold against the literal direction") {
    import graft.operators.Pca
    val df = Seq((7L, Array(0.5f, -0.5f)), (8L, Array(1.0f, 1.0f))).toDF("id", "v")
    val got = Pca.projectPrincipal(df, col("id"), col("v"), Array(2L, 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((7L, 500L * 2 - 500L * 3), (8L, 1000L * 2 + 1000L * 3)))
  }

  test("pcm16Frames decodes little-endian signed samples with exact frame stats") {
    import graft.operators.Multimodal
    import spark.implicits._
    // samples: 300, -2, 1, -1 (LE bytes), then an odd trailing byte (ignored)
    val bytes = Array[Byte](
      (300 & 0xff).toByte, (300 >> 8).toByte, // 300
      0xfe.toByte, 0xff.toByte,               // -2
      0x01, 0x00,                             // 1
      0xff.toByte, 0xff.toByte,               // -1
      0x7f)                                   // trailing odd byte
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", bytes, None, None, None),
      Multimodal.MediaRow(2L, "image", bytes, None, None, None), // skipped
      Multimodal.MediaRow(3L, "audio", null, None, None, None))  // skipped
      .toDS()
    val got = Multimodal.pcm16Frames(media, frameSize = 3)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(got.length == 2)
    val f0 = got(0) // samples 300, -2, 1: zc at 300->-2 and -2->1
    assert(f0.media_id == 1L && f0.frame_idx == 0L && f0.n_samples == 3L)
    assert(f0.energy_l1 == 303L && f0.zero_crossings == 2L)
    assert(f0.peak_min == -2L && f0.peak_max == 300L)
    val f1 = got(1) // sample -1 alone: no in-frame crossing
    assert(f1.n_samples == 1L && f1.energy_l1 == 1L && f1.zero_crossings == 0L)
    assert(f1.peak_min == -1L && f1.peak_max == -1L)
  }

  test("vadSpans merges contiguous kept frames and splits on gaps") {
    import graft.operators.Multimodal
    import spark.implicits._
    val frames = Seq(
      // id 1: frames 0,1 loud, 2 quiet, 3 loud -> spans [0,1] and [3,3]
      Multimodal.AudioFrame(1L, 0L, 10L, 20000L, 1L, -5L, 5L),
      Multimodal.AudioFrame(1L, 1L, 10L, 15000L, 1L, -5L, 5L),
      Multimodal.AudioFrame(1L, 2L, 10L, 100L, 0L, -1L, 1L),
      Multimodal.AudioFrame(1L, 3L, 10L, 30000L, 2L, -9L, 9L),
      // id 2: all quiet -> no spans
      Multimodal.AudioFrame(2L, 0L, 10L, 5L, 0L, -1L, 1L)).toDS()
    val got = Multimodal.vadSpans(frames, meanThreshold = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq((1L, 0L, 1L, 2L, 35000L), (1L, 3L, 3L, 1L, 30000L)))
  }

  test("randomProjection matches the driver-side reference fold exactly") {
    import graft.functions.VectorFunctions
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => (i + 1) * 0.5f)),
      (2L, Array.tabulate(8)(i => (8 - i) * -0.25f)))
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"), VectorFunctions.randomProjection(col("v"), 8, 4).as("rv"))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    val scale = 1.0 / math.sqrt(4.0)
    val want = vecs.map { case (id, v) =>
      (id, (0 until 4).map { j =>
        var acc = 0.0
        var i = 0
        while (i < 8) {
          acc = acc + v(i).toDouble * VectorFunctions.rademacherSignValue(j, i); i += 1
        }
        acc * scale
      }.toVector)
    }
    assert(got.toSeq == want)
  }

  test("randomProjection: identical vectors stay identical; signs are ±1 and stable") {
    import graft.functions.VectorFunctions
    // exact duplicates must project to exact duplicates (cosine 1 preserved)
    val v = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val df = Seq((1L, v), (2L, v)).toDF("id", "v")
    val out = df.select(VectorFunctions.randomProjection(col("v"), 16, 4).as("rv"))
      .collect().map(_.getSeq[Double](0).toVector)
    assert(out(0) == out(1))
    // sign matrix: only ±1, deterministic across calls
    for (j <- 0 until 4; i <- 0 until 16) {
      val s = VectorFunctions.rademacherSignValue(j, i)
      assert(s == 1.0 || s == -1.0)
      assert(s == VectorFunctions.rademacherSignValue(j, i))
    }
    // not degenerate: both signs occur
    val all = for (j <- 0 until 4; i <- 0 until 16) yield VectorFunctions.rademacherSignValue(j, i)
    assert(all.contains(1.0) && all.contains(-1.0))
  }
}
