package graft

import graft.multimodal.Multimodal
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multimodal: binary assets carry payload bytes + typed metadata") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val assets = Multimodal.asBinaryAssets(docs, "doc_id", "text")
    assert(assets.columns.toSeq ==
      Seq("asset_id", "media_type", "payload", "n_bytes"))
    val bytes = assets.orderBy("asset_id").select("n_bytes")
      .as[Long].collect().toSeq
    assert(bytes == Seq(5L, 6L)) // ö is 2 UTF-8 bytes
  }

  test("multimodal: embedBytes feature inference is deterministic, " +
    "batched per partition") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "diff"))
      .toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(
      Multimodal.asBinaryAssets(docs, "doc_id", "text"))
      .collect().sortBy(_.asset_id)
    assert(feats(0).features.toSeq == feats(1).features.toSeq)
    assert(feats(0).width == feats(1).width)
    assert(feats.forall(_.features.length == 8))
  }

  test("multimodal: frame sampling keeps every k-th fixed-size frame") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "text")
    // frameBytes=3 over 10 bytes → frames 0..3 (last short); everyK=2 → 0,2
    val frames = Multimodal.sampleFrames(
        Multimodal.asBinaryAssets(docs, "doc_id", "text"),
        frameBytes = 3, everyK = 2)
      .collect().sortBy(f => (f.asset_id, f.frame_idx))
    val got = frames.map(f =>
      (f.asset_id, f.frame_idx, new String(f.frame, "UTF-8"))).toSeq
    assert(got == Seq((1L, 0L, "abc"), (1L, 2L, "ghi"), (2L, 0L, "xy")))
  }

  test("multimodal: real NN resize — decode→sample→re-encode, exact pixels") {
    // 4×2 gray PNG with pix(x,y) = 10x + 40y; resize to 2×1:
    // dest (x,0) reads source (x*4/2, 0) = (0,0) and (2,0) → 0, 20
    val png = Multimodal.encodeGrayPng(4, 2, (x, y) => 10 * x + 40 * y)
    val assets = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = Multimodal.resizeImages(assets, 2, 1)
      .collect().sortBy(_.asset_id)
    assert(out(0).ok && out(0).width == 2 && out(0).height == 1)
    val meta = Multimodal.decodeImageMeta(1L, out(0).payload)
    assert(meta.ok && meta.width == 2 && meta.height == 1)
    assert(meta.luma_sum == 0 + 20 && meta.max_luma == 20)
    // corrupt input flows through as a sentinel row, not an exception
    assert(!out(1).ok && out(1).payload.isEmpty)
  }

  test("multimodal: real AVI demux — raw frames round-trip exactly") {
    // 2 frames of 5×3 (stride 16 ≠ 3w=15: padding must be excluded)
    val pix = (f: Int, x: Int, y: Int) => 10 * x + y + 100 * f
    val avi = Multimodal.encodeAviRawGray(5, 3, 2, pix)
    val assets = Seq((1L, avi), (2L, "not a video".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeVideoFrames(assets)
      .collect().sortBy(f => (f.asset_id, f.frame_idx))
    val good = out.filter(_.asset_id == 1L)
    assert(good.length == 2 && good.forall(_.ok))
    assert(good.map(_.frame_idx).toSeq == Seq(0L, 1L))
    assert(good.forall(f => f.width == 5 && f.height == 3))
    val expSum = (f: Int) => 3L * (for (y <- 0 until 3; x <- 0 until 5)
      yield (pix(f, x, y) & 0xFF).toLong).sum
    assert(good.map(_.luma_sum).toSeq == Seq(expSum(0), expSum(1)))
    assert(good.head.peak_luma == 42L) // pix(0,4,2) = 42
    // corrupt input → single sentinel row, not an exception
    val bad = out.filter(_.asset_id == 2L)
    assert(bad.length == 1 && !bad.head.ok && bad.head.frame_idx == -1L)
  }

  test("multimodal: AVI/MJPEG — compressed frames decode via ImageIO") {
    // flat-gray frames survive JPEG exactly enough to pin tight bounds
    val avi = Multimodal.encodeAviMjpegGray(16, 8, 3, (f, _, _) => 60 + f)
    val assets = Seq((7L, avi)).toDF("asset_id", "payload")
    val out = Multimodal.decodeVideoFrames(assets)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 3 && out.forall(_.ok))
    assert(out.forall(f => f.width == 16 && f.height == 8))
    // a constant-color JPEG decodes near-exactly: mean within ±2 of the
    // encoded value (lossy, so no exact equality — bounds only)
    out.zipWithIndex.foreach { case (f, i) =>
      val mean = f.luma_sum.toDouble / (16 * 8)
      assert(math.abs(mean - (60 + i)) <= 2.0,
        s"frame $i mean $mean vs ${60 + i}")
    }
  }

  test("multimodal: real audio codec — PCM16 WAV round-trips exactly") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 17)
    val wav = Multimodal.encodePcm16Wav(8000, samples)
    val assets = Seq((1L, wav), (2L, Array[Byte](1, 2, 3)))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeAudio(assets).collect().sortBy(_.asset_id)
    assert(out(0).ok && out(0).encoding == "pcm_signed")
    assert(out(0).channels == 1 && out(0).sample_rate == 8000)
    assert(out(0).n_samples == samples.length)
    assert(out(0).sum_sample == samples.map(_.toLong).sum)
    assert(out(0).sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    assert(out(0).peak_abs == 32768L)
    assert(!out(1).ok) // truncated payload → sentinel, not an exception
  }

  test("streaming windowed counts equal the batch aggregate") {
    val schema = Tables.eventsRaw(spark, TestSpark.sf).schema
    val streamed = Streams.runToMemory(spark, "spec_stream_counts") {
        scoped =>
          val stream = Tables.normalizeEventsTs(
            Streams.fileStream(scoped, s"${TestSpark.sf}/events.*", schema))
          Streams.windowedCounts(stream, "ts", "1 hour", "1 hour")
      }
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }
}
