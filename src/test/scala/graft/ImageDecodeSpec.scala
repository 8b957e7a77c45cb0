package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image-decode path (in-JDK javax.imageio codec): encode →
  * decode round-trips exact raster values, corrupt / truncated payloads
  * degrade to the ok=false sentinel row (never an exception — one bad
  * blob at 100 TB must not kill a stage), and multi-band images count
  * every band's samples.
  */
class ImageDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gray PNG round-trips exact dims and integer pixel features") {
    // 3×2 image with known samples: 10 20 30 / 40 50 255
    val vals = Array(Array(10, 20, 30), Array(40, 50, 255))
    val png = Multimodal.encodeGrayPng(3, 2, (x, y) => vals(y)(x))
    val m = Multimodal.decodeImageMeta(7L, png)
    assert(m.ok && m.format == "png")
    assert((m.width, m.height, m.n_bands, m.n_px) == (3L, 2L, 1L, 6L))
    assert(m.luma_sum == 10 + 20 + 30 + 40 + 50 + 255)
    assert(m.max_luma == 255L)
  }

  test("corrupt payload decodes to the ok=false sentinel, no exception") {
    val m = Multimodal.decodeImageMeta(1L, "definitely not an image".getBytes)
    assert(!m.ok && m.format == "" && m.width == -1L && m.height == -1L)
    assert(m.n_bands == 0L && m.n_px == 0L && m.luma_sum == 0L)
    // empty payload too
    assert(!Multimodal.decodeImageMeta(2L, Array.emptyByteArray).ok)
  }

  test("truncated PNG (valid magic, cut body) degrades to ok=false") {
    val png = Multimodal.encodeGrayPng(16, 16, (x, y) => (x * y) % 256)
    val truncated = java.util.Arrays.copyOf(png, png.length / 2)
    val m = Multimodal.decodeImageMeta(3L, truncated)
    assert(!m.ok, "truncated PNG must hit the sentinel, not throw")
  }

  test("multi-band (RGB) image counts samples across all bands") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.getRaster.setPixel(0, 0, Array(1, 2, 3))
    img.getRaster.setPixel(1, 0, Array(4, 5, 6))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val m = Multimodal.decodeImageMeta(4L, bos.toByteArray)
    assert(m.ok && m.n_bands == 3L && m.n_px == 2L)
    assert(m.luma_sum == 1 + 2 + 3 + 4 + 5 + 6)
    assert(m.max_luma == 6L)
  }

  test("distributed decode: mixed good/corrupt partition stays green") {
    val rows = (0L until 20L).map { id =>
      val payload =
        if (id % 5 == 0) s"junk$id".getBytes
        else Multimodal.encodeGrayPng(4, 3, (x, y) => (x + y + id.toInt) % 256)
      (id, payload)
    }
    val out = Multimodal.decodeImages(
        rows.toDF("asset_id", "payload").repartition(4))
      .collect().sortBy(_.asset_id)
    assert(out.length == 20)
    assert(out.count(_.ok) == 16)
    out.filter(_.ok).foreach { m =>
      val id = m.asset_id.toInt
      val expect = (for (y <- 0 until 3; x <- 0 until 4)
        yield (x + y + id) % 256).sum.toLong
      assert((m.width, m.height, m.luma_sum) == (4L, 3L, expect))
    }
  }
}
