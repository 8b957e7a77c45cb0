package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-11 additions: the MJPEG (compressed-video) decode path joins
  * the exact-hash oracle gate via a digest-pinned constant fixture.
  */
object Round11Queries {

  /** Constant 10-asset AVI fleet exercising BOTH frame-chunk codecs in
    * one demux pass: even ids are MJPEG (`00dc`, each frame JPEG-encoded
    * by the in-JDK codec), odd ids uncompressed BI_RGB (`00db`), and
    * ids 4/9 corrupt payloads (sentinel path). Deliberately
    * SF-independent: JPEG loss makes MJPEG features engine-exact but
    * not closed-form, so the oracle must be a pinned VALUES table and
    * the fixture must be the same fleet at every SF (the s12 constant-
    * fixture pattern).
    */
  private[queries] def mjpegFleetPayload(id: Long): Array[Byte] = {
    if (id % 5 == 4) s"not a video $id".getBytes("UTF-8")
    else {
      val w = 16 + (id % 4).toInt * 4
      val h = 12 + ((id / 2) % 3).toInt * 6
      val nf = 1 + (id % 3).toInt
      val pix = (f: Int, x: Int, y: Int) =>
        (x * 3 + y * 5 + f * 17 + id.toInt * 29) % 200
      if (id % 2 == 0) Multimodal.encodeAviMjpegGray(w, h, nf, pix)
      else Multimodal.encodeAviRawGray(w, h, nf, pix)
    }
  }

  def all: Seq[Q] = Seq(

    Q("m_video_frames_mjpeg",
      "REAL compressed-video demux+decode — the 00dc MJPEG path joins " +
        "the hash gate (it was the engine's last spec-only codec " +
        "path): a constant 10-asset AVI fleet mixes MJPEG frames " +
        "(JPEG-encoded and -decoded by the real in-JDK codec), " +
        "uncompressed BI_RGB frames, and corrupt payloads, and ONE " +
        "Multimodal.decodeVideoFrames pass demuxes both chunk types " +
        "(chunk walk, strf dims, per-frame decode fused with feature " +
        "extraction — frames never materialize). JPEG loss makes the " +
        "MJPEG features engine-exact but not closed-form, so the " +
        "oracle is the DIGEST-PINNED row set: decoded once, per-frame " +
        "integer features committed as a VALUES table — codec or " +
        "parser drift now breaks the exact-hash gate instead of " +
        "hiding behind a spec-only path.",
      (s, d) => {
        import s.implicits._
        // tiny constant fleet, still distributed through the same
        // mapPartitions decode plumbing the at-scale queries use
        s.range(0L, 10L).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => (id, mjpegFleetPayload(id)))
          .toDF("asset_id", "payload")
          .transform(df => Multimodal.decodeVideoFrames(df).toDF())
          .orderBy($"asset_id", $"frame_idx")
      },
      // digest pin (decoded once on the reference JDK codec; the gate
      // re-decodes from scratch every verify run, so any codec/parser
      // drift lands here as a hash mismatch)
      Some("""SELECT CAST(c0 AS BIGINT) AS asset_id, c1 AS ok,
             |  CAST(c2 AS BIGINT) AS frame_idx, CAST(c3 AS BIGINT) AS width,
             |  CAST(c4 AS BIGINT) AS height, CAST(c5 AS BIGINT) AS luma_sum,
             |  CAST(c6 AS BIGINT) AS peak_luma
             |FROM (VALUES
             |  (0, TRUE, 0, 16, 12, 9612, 99),
             |  (1, TRUE, 0, 20, 12, 61200, 141),
             |  (1, TRUE, 1, 20, 12, 73440, 158),
             |  (2, TRUE, 0, 24, 18, 56518, 226),
             |  (2, TRUE, 1, 24, 18, 58306, 216),
             |  (2, TRUE, 2, 24, 18, 56072, 222),
             |  (3, TRUE, 0, 28, 18, 191040, 199),
             |  (4, FALSE, -1, -1, -1, 0, 0),
             |  (5, TRUE, 0, 20, 24, 113040, 199),
             |  (5, TRUE, 1, 20, 24, 103320, 199),
             |  (5, TRUE, 2, 20, 24, 105600, 199),
             |  (6, TRUE, 0, 24, 12, 16190, 204),
             |  (7, TRUE, 0, 28, 12, 71568, 139),
             |  (7, TRUE, 1, 28, 12, 88704, 156),
             |  (8, TRUE, 0, 16, 18, 27932, 162),
             |  (8, TRUE, 1, 16, 18, 32828, 179),
             |  (8, TRUE, 2, 16, 18, 37724, 196),
             |  (9, FALSE, -1, -1, -1, 0, 0)
             |) AS t(c0, c1, c2, c3, c4, c5, c6)
             |ORDER BY asset_id, frame_idx""".stripMargin)),
  )
}
