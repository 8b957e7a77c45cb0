package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract
  * (schema, partition sizing, per-partition batched decode) is real and
  * tested. IMAGE decode is REAL — the in-JDK codec (`javax.imageio`:
  * PNG/BMP/GIF/JPEG/TIFF) via [[decodeImages]], no new dependency. The
  * audio/video codec remains a declared deterministic stub
  * ([[stubDecode]]) — no audio/video library ships in this container;
  * swap it for a real codec (JNI/JEP/native) without touching the
  * plumbing.
  */
object Multimodal {

  /** A decoded-asset feature row. `features` stands in for an
    * image-embedding / mel-spectrogram summary vector.
    */
  case class AssetFeatures(asset_id: Long, media_type: String,
                           n_bytes: Long, width: Int, height: Int,
                           features: Array[Double])

  /** STUB codec (audio/video only — IMAGE decode is real, see
    * [[decodeImages]]): deterministic fake decode deriving fake
    * dimensions and a fixed-width feature vector from the payload bytes.
    * A real implementation would decode the audio/video here; everything
    * around it (batching, schema, partition shape) is production
    * plumbing.
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 512)
    val height = 64 + math.abs((h / 512) % 512)
    val features = Array.tabulate(8)(i =>
      ((h >>> (i * 4)) & 0xF).toDouble / 15.0)
    (width, height, features)
  }

  /** REAL image decode result — every field integer-exact so the row is
    * oracle-verifiable when the image content is itself derived from
    * table data: `luma_sum` is the exact integer sum of ALL raster
    * samples across bands (for 8-bit gray: the pixel-value sum),
    * `max_luma` the max sample; no float leaves the decoder. A corrupt /
    * non-image payload decodes to the `ok = false` sentinel row
    * (-1 dims, zero counts) instead of failing the job — at 100 TB some
    * payloads WILL be truncated, and one bad blob must not kill a stage.
    */
  case class ImageMeta(asset_id: Long, ok: Boolean, format: String,
                       width: Long, height: Long, n_bands: Long,
                       n_px: Long, luma_sum: Long, max_luma: Long)

  /** Decode one image payload with the in-JDK codec. Format name comes
    * from the matched ImageReader ("png", "bmp", …, lowercased); pixel
    * features are computed from RAW raster samples (`getSample`), never
    * `getRGB` — no color-space conversion, so an 8-bit gray PNG
    * round-trips its exact byte values and the features replay in closed
    * form on any engine. Unrecognized or truncated payloads → ok=false
    * sentinel (never an exception).
    */
  def decodeImageMeta(id: Long, bytes: Array[Byte]): ImageMeta = {
    val bad = ImageMeta(id, ok = false, "", -1L, -1L, 0L, 0L, 0L, 0L)
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) bad
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase
            val img = reader.read(0)
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            var sum = 0L; var max = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < bands) {
                  val s = raster.getSample(x, y, b).toLong
                  sum += s; if (s > max) max = s
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            ImageMeta(id, ok = true, fmt, w.toLong, h.toLong,
              bands.toLong, w.toLong * h, sum, max)
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  /** Batched REAL image decode over the binary column — same
    * `mapPartitions` batch shape as [[decodeFeatures]] (per-partition
    * codec init amortized; upstream partition sizing bounds batch
    * memory). `ImageIO.setUseCache(false)` keeps the codec on heap
    * buffers instead of a temp-file cache per payload — at decode
    * throughput the temp-file churn IS the bottleneck.
    */
  def decodeImages(assets: DataFrame): Dataset[ImageMeta] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        it.map { case (id, bytes) => decodeImageMeta(id, bytes) }
      }
  }

  /** Encode an 8-bit grayscale PNG from a pixel function — the
    * fixture-side counterpart of [[decodeImages]] (and a real encoder:
    * the same `ImageIO.write` path a resize/re-encode stage would use).
    * Values are written into the raster directly, so `pix(x, y) & 0xFF`
    * is exactly what decode's `getSample` reads back — PNG is lossless
    * and gray carries no color-space transform.
    */
  def encodeGrayPng(width: Int, height: Int,
                    pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, pix(x, y) & 0xFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no PNG writer in this JDK")
    bos.toByteArray
  }

  /** Attach binary payload + metadata columns. In a real pipeline the binary
    * comes from `spark.read.format("binaryFile")` or a bytes column in
    * parquet; the contract is just (id, media_type, payload).
    */
  def asBinaryAssets(df: DataFrame, idCol: String,
                     payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      lit("image/fake").as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      octet_length(col(payloadCol).cast("binary")).cast("long")
        .as("n_bytes"))

  /** Batched decode/feature-extract over the binary column. Runs as
    * `mapPartitions` so a real codec amortizes per-batch init (model load,
    * decoder context) once per partition — the Scala analog of
    * `mapInPandas` batch shape. Partition sizing upstream controls batch
    * memory: repartition so `rows_per_partition × avg_payload` fits the
    * executor (for 100 TB of images: `maxPartitionBytes` on the binaryFile
    * scan does this for free).
    */
  /** Frame sampling over an opaque media payload: treat the binary as
    * fixed-size frames and keep every `everyK`-th — the video keyframe /
    * audio-window sampling shape. Pure byte arithmetic on the stub side
    * (a real container format would parse frame boundaries in the same
    * loop); one typed pass, rows multiply by ≤ n_frames/everyK, and the
    * emitted frames carry their index so downstream ordering is explicit.
    */
  case class Frame(asset_id: Long, frame_idx: Long, frame: Array[Byte])

  def sampleFrames(assets: DataFrame, frameBytes: Int,
                   everyK: Int): Dataset[Frame] = {
    require(frameBytes > 0 && everyK > 0)
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, everyK).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, payload.length)
          Frame(id, f.toLong, java.util.Arrays.copyOfRange(payload,
            from, until))
        }
      }
  }

  def decodeFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "media_type", "payload", "n_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition init happens here (once), not per row
        it.map { case (id, mt, payload, nBytes) =>
          val (w, hgt, feats) = stubDecode(payload)
          AssetFeatures(id, mt, nBytes, w, hgt, feats)
        }
      }
  }

  /** Resize (STUB): decode → scale → re-encode collapses here to a
    * deterministic payload transform that tags the target dimensions in
    * the metadata. Same plumbing contract as a real resizer: payload in,
    * payload out, metadata updated, one typed pass.
    */
  case class Resized(asset_id: Long, width: Int, height: Int,
                     payload: Array[Byte])

  def resizeStub(assets: DataFrame, width: Int, height: Int): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        // fake "resize": truncate/pad the payload to width*height/64 bytes
        val n = math.max(1, width * height / 64)
        Resized(id, width, height, java.util.Arrays.copyOf(payload, n))
      })
  }
}
