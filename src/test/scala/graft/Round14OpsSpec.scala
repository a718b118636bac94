package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: the RIFF/WAVE container parse (chunk walk, junk
  * skip, truncation clamp, channel-0 deinterleave) and the stream-stream
  * left-outer join's null-emission rule. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mm = graft.operators.Multimodal

  /** Hand-built WAV: `channels`-channel 16-bit PCM at `rate`, sample
    * (ch, t) = samples(t)(ch), with an optional junk chunk before data
    * and an optional truncation of the final bytes. */
  private def wav(
      channels: Int, rate: Int, samples: Seq[Seq[Int]],
      junkBytes: Int = 0, truncate: Int = 0): Array[Byte] = {
    val dataLen = samples.length * channels * 2
    val junk = if (junkBytes > 0) 8 + junkBytes else 0
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + junk + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + junk + 8 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(channels.toShort).putInt(rate).putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort).putShort(16)
    if (junkBytes > 0) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(junkBytes)
      (0 until junkBytes).foreach(j => bb.put((j % 251).toByte))
    }
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(fr => fr.foreach(s => bb.putShort(s.toShort)))
    val full = bb.array()
    if (truncate > 0) java.util.Arrays.copyOfRange(full, 0, full.length - truncate) else full
  }

  test("parseWav reads fmt through a junk chunk and finds data") {
    val p = wav(2, 16000, Seq(Seq(1, -1), Seq(100, -100), Seq(0, 32000)), junkBytes = 6)
    val w = mm.parseWav(p).get
    assert(w.audioFormat == 1 && w.channels == 2 && w.sampleRate == 16000)
    assert(w.bitsPerSample == 16 && w.blockAlign == 4)
    assert(w.dataOffset == 12 + 24 + 14 + 8) // preamble + fmt + (LIST hdr + 6) + data hdr
    assert(w.dataBytes == 12)
  }

  test("parseWav clamps a data size field past the payload (truncated file)") {
    val p = wav(1, 8000, (0 until 10).map(i => Seq(i * 100)), truncate = 6)
    val w = mm.parseWav(p).get
    assert(w.dataBytes == 14) // 20 declared, 6 bytes missing
  }

  test("parseWav rejects malformed containers") {
    assert(mm.parseWav(null).isEmpty)
    assert(mm.parseWav(Array.fill[Byte](4)(0)).isEmpty)
    val good = wav(1, 8000, Seq(Seq(1)))
    assert(mm.parseWav(good).isDefined)
    // wrong preamble
    val bad1 = good.clone(); bad1(0) = 'X'.toByte
    assert(mm.parseWav(bad1).isEmpty)
    val bad2 = good.clone(); bad2(8) = 'X'.toByte
    assert(mm.parseWav(bad2).isEmpty)
    // data before fmt: swap the two chunks' ids so "data" arrives first
    val swapped = good.clone()
    Seq(('d', 12), ('a', 13), ('t', 14), ('a', 15)).foreach { case (c, i) => swapped(i) = c.toByte }
    assert(mm.parseWav(swapped).isEmpty)
    // zero channels
    val zc = good.clone(); zc(22) = 0; zc(23) = 0
    assert(mm.parseWav(zc).isEmpty)
    // raw PCM (no header at all)
    assert(mm.parseWav(Array.fill[Byte](64)(7)).isEmpty)
  }

  test("wavPcmFrames deinterleaves channel 0 of a stereo container") {
    val ch0 = Seq(10, -20, 30, -40, 50)
    val ch1 = Seq(9999, 9999, 9999, 9999, 9999) // must NOT leak into stats
    val rows = Seq(mm.MediaRow(1L, "audio",
      wav(2, 8000, ch0.zip(ch1).map { case (a, b) => Seq(a, b) }), None, None, None)).toDS()
    val got = mm.wavPcmFrames(rows, frameSize = 3).collect().sortBy(_.frame_idx)
    assert(got.length == 2)
    assert(got(0).energy_l1 == 10 + 20 + 30 && got(0).n_samples == 3)
    assert(got(0).zero_crossings == 2 && got(0).peak_min == -20 && got(0).peak_max == 30)
    assert(got(1).energy_l1 == 40 + 50 && got(1).n_samples == 2)
    assert(got(1).peak_min == -40 && got(1).peak_max == 50)
  }

  test("wavPcmFrames headerless fallback matches pcm16Frames exactly") {
    val raw = Array.tabulate[Byte](200)(i => ((i * 37 + 11) % 256).toByte)
    val rows = Seq(mm.MediaRow(7L, "audio", raw, None, None, None)).toDS()
    val a = mm.wavPcmFrames(rows, frameSize = 16).collect().sortBy(_.frame_idx).toSeq
    val b = mm.pcm16Frames(rows, frameSize = 16).collect().sortBy(_.frame_idx).toSeq
    assert(a == b)
  }

  test("wavMeta: container duration is floor(frames*1000/rate); raw rows report unknown") {
    val rows = Seq(
      mm.MediaRow(1L, "audio", wav(1, 12000, (0 until 430).map(i => Seq(i))), None, None, None),
      mm.MediaRow(2L, "audio", Array.fill[Byte](10)(1), None, None, None)).toDS()
    val byId = mm.wavMeta(rows).collect().map(m => m.media_id -> m).toMap
    assert(byId(1L).parsed && byId(1L).duration_ms == 430L * 1000L / 12000L) // 35, floored
    assert(byId(1L).sample_rate == 12000 && byId(1L).n_frames == 430)
    assert(!byId(2L).parsed && byId(2L).duration_ms == -1L && byId(2L).n_frames == 5)
  }

  /** Hand-built AVI: nFrames chunks of frameBytes, keyframes where
    * `key(f)`, idx1 offsets movi-relative or absolute. */
  private def avi(
      nFrames: Int, frameBytes: Int, usPerFrame: Int, relOffsets: Boolean,
      key: Int => Boolean = _ % 2 == 0, truncate: Int = 0): Array[Byte] = {
    val moviData = nFrames * (8 + frameBytes)
    val total = 12 + 76 + (12 + moviData) + (8 + nFrames * 16)
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8).put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(68).put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(56)
    bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10)
    bb.putInt(nFrames).putInt(0).putInt(1).putInt(0).putInt(320).putInt(240)
    bb.putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes("US-ASCII")).putInt(4 + moviData).put("movi".getBytes("US-ASCII"))
    val moviPos = 12 + 76 + 8
    (0 until nFrames).foreach { f =>
      bb.put("00dc".getBytes("US-ASCII")).putInt(frameBytes)
      (0 until frameBytes).foreach(j => bb.put(((f * 29 + j * 3) % 256).toByte))
    }
    bb.put("idx1".getBytes("US-ASCII")).putInt(nFrames * 16)
    (0 until nFrames).foreach { f =>
      val rel = 4 + f * (8 + frameBytes)
      bb.put("00dc".getBytes("US-ASCII")).putInt(if (key(f)) 0x10 else 0)
      bb.putInt(if (relOffsets) rel else moviPos + rel).putInt(frameBytes)
    }
    val full = bb.array()
    if (truncate > 0) java.util.Arrays.copyOfRange(full, 0, full.length - truncate) else full
  }

  test("parseAvi resolves both idx1 offset conventions to identical coordinates") {
    val rel = mm.parseAvi(avi(4, 20, 40000, relOffsets = true)).get
    val abs = mm.parseAvi(avi(4, 20, 40000, relOffsets = false)).get
    assert(rel.entries == abs.entries)
    assert(rel.usPerFrame == 40000 && rel.totalFrames == 4 && rel.width == 320)
    // first frame's data offset: movi fourcc (96) + 4 + chunk header (8)
    assert(rel.entries.head.offset == 96 + 4 + 8)
    assert(rel.entries.map(_.keyframe) == Seq(true, false, true, false))
  }

  test("parseAvi drops index entries whose data range falls outside the payload") {
    val good = avi(4, 20, 40000, relOffsets = true)
    // corrupt the LAST idx1 entry's size field (final 4 bytes) to claim
    // 100000 bytes — its data range now exceeds the payload
    val bad = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(bad.length - 4, 100000)
    val p = mm.parseAvi(bad).get
    assert(p.entries.length == 3)
    assert(p.entries.map(_.frameIdx) == Seq(0, 1, 2))
    // a file truncated past its whole index parses to None (no idx1)
    assert(mm.parseAvi(java.util.Arrays.copyOfRange(good, 0, good.length - (8 + 64))).isEmpty)
  }

  test("parseAvi rejects non-AVI payloads") {
    assert(mm.parseAvi(null).isEmpty)
    assert(mm.parseAvi(Array.fill[Byte](64)(3)).isEmpty)
    val wavBytes = wav(1, 8000, Seq(Seq(1)))
    assert(mm.parseAvi(wavBytes).isEmpty) // RIFF but WAVE, not AVI
    assert(mm.parseWav(avi(2, 20, 40000, relOffsets = true)).isEmpty) // and vice versa
  }

  test("sampleFramesAvi snaps samples to the nearest preceding keyframe") {
    // 6 frames at 100 ms each, keyframes at 0 and 3 -> duration 600 ms,
    // samples at 0,150,300,450 ms -> raw frames 0,1,3,4 -> snapped 0,0,3,3
    val rows = Seq(mm.MediaRow(5L, "video",
      avi(6, 20, 100000, relOffsets = true, key = f => f % 3 == 0), None, None, None)).toDS()
    val got = mm.sampleFramesAvi(rows, everyMs = 150L, fallbackFrameBytes = 8)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 4)
    assert(got.map(_.ts_ms).toSeq == Seq(0L, 150L, 300L, 450L))
    // frame 0 and frame 3 bytes from the formula
    def frame(f: Int) = Array.tabulate[Byte](20)(j => ((f * 29 + j * 3) % 256).toByte)
    assert(got(0).payload.sameElements(frame(0)) && got(1).payload.sameElements(frame(0)))
    assert(got(2).payload.sameElements(frame(3)) && got(3).payload.sameElements(frame(3)))
  }

  test("sampleFramesAvi falls back to the stub for unparseable payloads") {
    val raw = Array.tabulate[Byte](100)(i => i.toByte)
    val rows = Seq(mm.MediaRow(9L, "video", raw, None, None, Some(100L))).toDS()
    val got = mm.sampleFramesAvi(rows, everyMs = 60L, fallbackFrameBytes = 24)
      .collect().sortBy(_.frame_idx)
    val want = mm.sampleFrames(rows, everyMs = 60L, frameBytes = 24)
      .collect().sortBy(_.frame_idx)
    assert(got.length == want.length &&
      got.zip(want).forall { case (a, b) =>
        a.ts_ms == b.ts_ms && a.payload.sameElements(b.payload) })
  }

  test("incrementalDedupWithBloom: disk-round-tripped bloom gives the exact anti-join result") {
    import graft.operators.Dedup
    val seen = (0 until 200).map(i => (i.toLong, s"text-${i % 150}")).toDF("id", "text")
    val batch = (200 until 300).map(i => (i.toLong, s"text-${i % 170}")).toDF("id", "text")
    val plain = Dedup.incrementalDedup(batch, md5(col("text")), seen, md5(col("text")),
      expectedSeen = 200).select("id").collect().map(_.getLong(0)).toSet
    val f = java.nio.file.Files.createTempFile("bloom", ".bin").toString
    Dedup.saveBloom(Dedup.buildSeenBloom(seen, md5(col("text")), expectedSeen = 200), f)
    val viaBloom = Dedup.incrementalDedupWithBloom(batch, md5(col("text")),
      seen, md5(col("text")), Dedup.loadBloom(f))
      .select("id").collect().map(_.getLong(0)).toSet
    // ground truth: plain anti-join on the fingerprint
    val want = batch.join(seen.select(md5(col("text")).as("fp")),
      md5(col("text")) === col("fp"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plain == want && viaBloom == want)
    java.nio.file.Files.delete(java.nio.file.Paths.get(f)); ()
  }

  test("stream-stream left outer join: null row only after watermark proves absence") {
    val out = graft.streaming.StreamHarness.runBatchesTwo(
      spark, QueriesEventsQuality.streamJoinOuterBatches,
      (l, r) => graft.streaming.EventStream.intervalJoin(
        l, r, within = "15 minutes", joinType = "left_outer"))
      .filter(col("user_id") < 90)
      .select(col("user_id"), col("l_id"), col("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // V1*P11 and V3*P13 match; V2 emits the watermark-forced null row;
    // the late V9 emits NOTHING (dropped on input, so no phantom null)
    assert(out == Set((1L, 1L, 11L), (3L, 3L, 13L), (2L, 2L, -1L)))
  }
}
