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

  test("multimodal: stub decode is deterministic, batched per partition") {
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

  test("multimodal: resize stub keeps contract (payload out, dims tagged)") {
    val docs = Seq((1L, "payload-bytes-here")).toDF("doc_id", "text")
    val out = Multimodal.resizeStub(
        Multimodal.asBinaryAssets(docs, "doc_id", "text"), 128, 128)
      .collect().head
    assert(out.width == 128 && out.height == 128)
    assert(out.payload.length == 128 * 128 / 64)
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
