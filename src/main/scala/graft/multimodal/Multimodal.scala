package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract
  * (schema, partition sizing, per-partition batched decode) is real and
  * tested; the codec itself is STUBBED with a deterministic fake — the
  * actual image/audio libraries are not in this container. Swap
  * `stubDecode` for a real codec (JNI/JEP/native) without touching the
  * plumbing.
  */
object Multimodal {

  /** A decoded-asset feature row. `features` stands in for an
    * image-embedding / mel-spectrogram summary vector.
    */
  case class AssetFeatures(asset_id: Long, media_type: String,
                           n_bytes: Long, width: Int, height: Int,
                           features: Array[Double])

  /** STUB codec — deterministic fake decode: derives fake dimensions and a
    * fixed-width feature vector from the payload bytes. A real
    * implementation would decode the image/audio here; everything around it
    * (batching, schema, partition shape) is production plumbing.
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 512)
    val height = 64 + math.abs((h / 512) % 512)
    val features = Array.tabulate(8)(i =>
      ((h >>> (i * 4)) & 0xF).toDouble / 15.0)
    (width, height, features)
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
