package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image-decode path (round-12): javax.imageio raster decode
  * feeding resize / features / perceptual hashing, with deterministic
  * formula-pixel PNG fixtures (lossless — decoded values re-derivable)
  * and a JPEG fixture (lossy — dimensions and decode success checked,
  * values asserted within quantization distance). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // formula raster: pixel(x, y) = (id*31 + x*7 + y*13) % 256
  private def raster(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(j => ((id * 31 + (j % w) * 7 + (j / w) * 13) % 256).toByte)

  private def mediaRow(id: Long, w: Int, h: Int, fmt: String = "png") =
    Multimodal.MediaRow(id, "image",
      Multimodal.encodeGray(w, h, raster(id, w, h), fmt), None, None, None)

  test("png decode is pixel-exact (lossless roundtrip), jpeg decodes near") {
    val (w, h) = (9, 7)
    val png = Multimodal.encodeGray(w, h, raster(5L, w, h))
    val Some((dw, dh, px)) = Multimodal.decodeGray(png)
    assert((dw, dh) == (w, h))
    assert(px.toSeq == raster(5L, w, h).toSeq)
    val jpg = Multimodal.encodeGray(w, h, raster(5L, w, h), "jpg")
    val Some((jw, jh, jpx)) = Multimodal.decodeGray(jpg)
    assert((jw, jh) == (w, h))
    val want = raster(5L, w, h)
    val maxErr = jpx.indices.map(i => math.abs((jpx(i) & 0xff) - (want(i) & 0xff))).max
    assert(maxErr <= 48, s"jpeg drifted $maxErr gray levels") // lossy but sane
    assert(Multimodal.decodeGray("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeGray(Array.emptyByteArray).isEmpty)
  }

  test("rgb decode uses integer BT.601 luma on raster samples") {
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, ((x * 20) << 16) | ((y * 30) << 8) | 77)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, px)) = Multimodal.decodeGray(bos.toByteArray)
    assert((w, h) == (4, 3))
    for (y <- 0 until 3; x <- 0 until 4)
      assert((px(y * 4 + x) & 0xff) == (299 * (x * 20) + 587 * (y * 30) + 114 * 77) / 1000)
  }

  test("decodeImages drops undecodable rows; resizeImages resamples the true raster") {
    val media = Seq(
      mediaRow(1L, 8, 6),
      mediaRow(2L, 12, 4),
      Multimodal.MediaRow(3L, "image", "garbage".getBytes, None, None, None),
    ).toDS()
    val dec = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(dec.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(dec(0).pixels.toSeq == raster(1L, 8, 6).toSeq)
    val rs = Multimodal.resizeImages(media.filter(_.media_id == 2L), 4, 4).collect()(0)
    val want = Multimodal.nnResample(raster(2L, 12, 4), 12, 4, 4, 4)
    assert(rs.payload.toSeq == want.toSeq)
    // 2D NN formula spot check: out(1,2) = in((1*4) div 4 = 1, (2*12) div 4 = 6)
    assert(rs.payload(1 * 4 + 2) == raster(2L, 12, 4)(1 * 12 + 6))
  }

  test("extractFeatures: real block means for images, byte fallback elsewhere") {
    val media = Seq(
      mediaRow(1L, 8, 8),
      Multimodal.MediaRow(9L, "audio", Array.tabulate[Byte](40)(i => i.toByte),
        None, None, None),
    ).toDS()
    val f = Multimodal.extractFeatures(media, dim = 4).collect().sortBy(_.media_id)
    assert(f(0).decoded && f(0).width == 8 && f(0).height == 8 && f(0).n_values == 64)
    val px = raster(1L, 8, 8)
    val want = (0 until 4).map { j =>
      val (lo, hi) = (j * 16, (j + 1) * 16)
      (lo until hi).map(px(_) & 0xff).sum.toDouble / 16
    }
    assert(f(0).feature.toSeq == want)
    assert(!f(1).decoded && f(1).n_values == 40)
    assert(f(1).feature(0) == (0 until 10).sum.toDouble / 10)
  }

  test("aHash over DECODED pixels: lossless re-encode pairs at hamming 0") {
    val ids = 1L to 6L
    val media = ids.map(i => mediaRow(i, 8 + (i % 3).toInt, 8)).toDS()
    // lossless re-encode of the same raster under a shifted id
    val copies = ids.take(2).map { i =>
      val w = 8 + (i % 3).toInt
      Multimodal.MediaRow(i + 100, "image",
        Multimodal.encodeGray(w, 8, raster(i, w, 8)), None, None, None)
    }.toDS()
    val decoded = Multimodal.decodeImages(media.union(copies)).toDF()
      .select(col("media_id").as("id"), col("pixels").as("payload"))
    val pairs = Multimodal.aHashNearDupPairs(decoded, col("id"), col("payload"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 101L)))
    assert(pairs.contains((2L, 102L)))
  }
}
