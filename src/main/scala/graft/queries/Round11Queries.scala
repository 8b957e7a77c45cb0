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

  /** Five one-file shards with CONTROLLED event times and an EXPLICIT
    * arrival order (modTimes re-stamped with 10 s gaps after each shard
    * is moved into the stream dir under its own name — the file source
    * orders unseen files by modification time, and late-data semantics
    * depend on WHICH batch advances the watermark first). Built once
    * per JVM per SF. Base epoch 2026-01-01T00:00:00Z.
    *
    * MEASURED Spark micro-batch subtlety this layout encodes: the
    * late-row DATA filter uses the watermark as of the batch's
    * PLANNING, which happens one batch earlier than the progress-
    * reported start watermark — data advancing the watermark in batch
    * k only FILTERS input in batch k+2 (verified with a MemoryStream
    * vs file-source A/B and an advancer-shard bisection; eviction/
    * emission in the trailing no-data batch uses the fully-updated
    * watermark). Hence TWO advancer shards (1 and 2) ahead of the
    * late shard (3), making the drop deterministic.
    */
  private[queries] def lateShards(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    import s.implicits._
    val base = 1767225600L
    Scratch.cachedDir(s"lateshards:$d") { tmp =>
      val ids = Tables.documents(s, d).select($"doc_id")
      def rows(filterMod: Option[(Long, Long)], voff: Long, minute: Long,
               spreadByDoc: Boolean) = {
        val f = filterMod.fold(ids) { case (m, r) =>
          ids.filter(pmod($"doc_id", lit(m)) === r) }
        val mins =
          if (spreadByDoc) pmod($"doc_id", lit(10L)).cast("long")
          else lit(minute)
        f.select($"doc_id".as("user_id"),
          (lit(voff) + $"doc_id").as("v"),
          timestamp_seconds(lit(base) + mins * 60L).as("ts"))
      }
      val shards = Seq(
        rows(None, 0L, 0L, spreadByDoc = true), // W0: minutes 0-9
        rows(Some((5L, 0L)), 1000L, 30L, spreadByDoc = false), // advancer 1
        rows(Some((13L, 0L)), 1500L, 32L, spreadByDoc = false), // advancer 2
        // one LATE cohort (minute 12 — window closed two batches ago,
        // dropped) and one on-time cohort (minute 31) in the SAME batch
        rows(Some((3L, 0L)), 2000L, 12L, spreadByDoc = false)
          .unionByName(
            rows(Some((7L, 0L)), 3000L, 31L, spreadByDoc = false)),
        rows(Some((11L, 0L)), 4000L, 50L, spreadByDoc = false))
      shards.zipWithIndex.foreach { case (df, i) =>
        val stage = new java.io.File(tmp, s"stage$i")
        df.coalesce(1).write.parquet(stage.getAbsolutePath)
        val data = stage.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val tgt = new java.io.File(tmp, s"shard$i.parquet")
        java.nio.file.Files.move(data.toPath, tgt.toPath)
        Scratch.rmTree(stage)
        // the modTime stamp IS the arrival order — a silently failed
        // stamp would turn the deterministic watermark trajectory into
        // an opaque oracle mismatch, so fail fast naming the shard
        require(tgt.setLastModified(1000000000000L + i * 10000L),
          s"failed to stamp modTime on shard$i.parquet — stream " +
            "arrival order (and the watermark replay) would be " +
            "nondeterministic")
      }
    }.getAbsolutePath
  }

  /** The leakage-safe split composition (see `curate_leakproof_split`),
    * optionally corpus-capped (the registered query caps at doc_id <
    * 1500 so the recursive-CTE oracle replay stays tractable; the
    * ScaleProbe `probe_leakproof_uncapped` entry drives THIS helper
    * uncapped so the banded-join + CC + split composition is
    * scale-probed under its real shape). Candidate edges come from the
    * hot-bucket-capped generator: star-reduction preserves connected
    * components exactly (clique and star on one vertex set have the
    * same component), so the cluster ids — and therefore the split —
    * are identical to the uncapped clique's even when the cap engages.
    */
  private[graft] def leakproofSplit(
      s: org.apache.spark.sql.SparkSession, d: String,
      maxDocId: Option[Long]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val all = Tables.documents(s, d)
    val docs = maxDocId.fold(all)(m => all.filter($"doc_id" < m))
    val edges = graft.dedup.Dedup.minhashCandidatesPortable(
      docs, "doc_id", "text", shingleN = 5, bands = 8, rowsPerBand = 2)
    graft.dedup.Dedup
      .duplicateClusters(docs.select($"doc_id"), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
      // NOTE: (c % 1000003) · 2654435761 mod 100 depends only on
      // c mod 100 — a fixed PERMUTATION of the last two decimal digits,
      // periodic over sequential ids, not a mixing hash. Deliberately
      // kept: it is the curate_split_assign convention (Round6Queries),
      // both oracles replay it, and for split assignment a balanced
      // permutation of id mod 100 is sufficient; swapping in a mixing
      // hash would break both committed oracles for zero semantic gain.
      .withColumn("h",
        ($"cluster_id" % 1000003L) * 2654435761L % 100L)
      .select($"doc_id", $"cluster_id",
        when($"h" < 80, "train").when($"h" < 90, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
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
      // drift lands here as a hash mismatch). Reference JDK: OpenJDK
      // 17.0.20 (Debian 17.0.20+8) — JPEG IDCT output is NOT bit-exact
      // across JDK vendors/versions, so a red row here on a DIFFERENT
      // JVM means codec drift (re-pin after reviewing the new values),
      // not an engine/parser regression.
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

    Q("stream_late_data_drop",
      "Watermark LATE-DATA semantics under the exact oracle — the " +
        "streaming behavior every monitoring rollup at 100 TB depends " +
        "on but that is usually only eyeballed: an APPEND-mode " +
        "10-minute windowed aggregation (5-minute watermark) over 5 " +
        "ordered one-file micro-batches where early batches advance " +
        "the watermark past an early window (TWO advancer batches — " +
        "the data filter uses the watermark as of batch PLANNING, one " +
        "batch behind the progress value; measured, see lateShards), " +
        "a later batch then delivers BOTH a late cohort (minute 12 — " +
        "its window closed two batches ago, dropped by the watermark, " +
        "value-tagged so any leak breaks the sum) and an on-time " +
        "cohort (minute 31) in the SAME batch, and the final batch " +
        "advances the watermark so the mid window emits while the " +
        "newest window correctly NEVER does (append mode only emits " +
        "closed windows). Arrival order is pinned by re-stamped file " +
        "modTimes (the file source orders by modTime), so the " +
        "watermark trajectory — and therefore exactly which rows drop " +
        "and which windows emit — replays in closed form.",
      (s, d) => {
        import s.implicits._
        val shards = lateShards(s, d)
        val schema = s.read.parquet(shards).schema
        graft.streaming.Streams.runToMemoryAppendMulti(s,
            s"stream_late_${System.nanoTime()}") { scoped =>
          graft.streaming.Streams.fileStream(scoped, shards, schema,
              maxFilesPerTrigger = 1)
            .withWatermark("ts", "5 minutes")
            .groupBy(window($"ts", "10 minutes"))
            .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
            .select(unix_seconds($"window.start").as("window_start"),
              $"n", $"sum_v")
        }.orderBy($"window_start")
      },
      // closed-form replay: W0 = every doc at minutes 0-9 (emits once
      // the batch-1 watermark passes it); W3 = the %5 cohort plus the
      // %7 on-time cohort (emits on the final watermark batch); the %3
      // late cohort (v = 2000+doc) appears NOWHERE; W5 (minute 50)
      // never emits — append mode, watermark stops at 45
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |w0 AS (
             |  SELECT CAST(1767225600 AS BIGINT) AS window_start,
             |    count(*) AS n,
             |    CAST(sum(doc_id) AS BIGINT) AS sum_v
             |  FROM d),
             |r3 AS (
             |  SELECT 1000 + doc_id AS v FROM d WHERE doc_id % 5 = 0
             |  UNION ALL
             |  SELECT 1500 + doc_id FROM d WHERE doc_id % 13 = 0
             |  UNION ALL
             |  SELECT 3000 + doc_id FROM d WHERE doc_id % 7 = 0),
             |w3 AS (
             |  SELECT CAST(1767225600 + 1800 AS BIGINT) AS window_start,
             |    count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v
             |  FROM r3)
             |SELECT * FROM w0 UNION ALL SELECT * FROM w3
             |ORDER BY window_start""".stripMargin)),

    Q("curate_leakproof_split",
      "Leakage-safe train/val/test split — the curation op that closes " +
        "the contamination pathway a doc-level random split leaves " +
        "open: near-duplicates of training documents land in the eval " +
        "split and inflate benchmarks. Near-dup clusters = connected " +
        "components (Dedup.duplicateClusters, alternating large-star/" +
        "small-star rounds) over portable-minhash band collisions, then the " +
        "WHOLE CLUSTER is assigned 80/10/10 by the multiplicative " +
        "integer hash of its cluster id (the curate_split_assign " +
        "arithmetic keyed by cluster) — same-cluster docs share a " +
        "split by construction, so no near-dup pair ever crosses one. " +
        "Corpus capped at doc_id < 1500 for the recursive-CTE oracle " +
        "replay; the Spark path itself is the d_minhash_lsh + CC scale " +
        "shape (band self-join, never corpus², O(diameter) label " +
        "rounds).",
      (s, d) => leakproofSplit(s, d, Some(1500L)),
      Some(OracleGen.leakproofSplitSql(shingleN = 5, bands = 8,
        rowsPerBand = 2, maxDocId = 1500L))),

    Q("t_unicode_normalize",
      "Unicode NFC normalization as a native codegen'd Catalyst " +
        "expression (graft.functions.UnicodeNormalize — Spark ships no " +
        "normalizer, and dedup keys hashed over un-normalized text " +
        "treat the precomposed and combining-sequence spellings of the " +
        "same visible string as different documents). Each doc's text " +
        "gains a deterministic tail cycling precomposed é, " +
        "decomposed e+U+0301, A+U+030A, and plain ASCII; the expression " +
        "normalizes the FULL string (exercising the isNormalized " +
        "zero-alloc fast path on the ASCII bulk) and the oracle replays " +
        "with DuckDB's nfc_normalize over chr()-built tails — two " +
        "independent NFC implementations, identical bytes or the hash " +
        "gate breaks. Char counts before/after pin the contraction.",
      (s, d) => {
        import s.implicits._
        import graft.functions.text._
        val tail = element_at(
          // explicit escapes: slot 1 is PRECOMPOSED U+00E9, slot 2 the
          // visually identical decomposed e + combining acute — the
          // exact confusion the normalizer exists to collapse
          typedLit(Seq("\u00e9", "e\u0301", "A\u030a", "x")),
          (pmod($"doc_id", lit(4L)) + 1).cast("int"))
        val combined = concat($"text", lit(" "), tail)
        Tables.documents(s, d)
          .select($"doc_id", combined.as("raw"))
          .select($"doc_id",
            length($"raw").as("pre_chars"),
            unicode_normalize($"raw", "NFC").as("norm"))
          .select($"doc_id", $"pre_chars",
            length($"norm").as("post_chars"),
            substring($"norm", -3, 3).as("norm_tail"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    text || ' ' || CASE CAST(doc_id % 4 AS INT)
             |      WHEN 0 THEN chr(233)
             |      WHEN 1 THEN 'e' || chr(769)
             |      WHEN 2 THEN 'A' || chr(778)
             |      ELSE 'x' END AS raw
             |  FROM documents),
             |n AS (
             |  SELECT doc_id, length(raw) AS pre_chars,
             |    nfc_normalize(raw) AS norm
             |  FROM t)
             |SELECT doc_id, CAST(pre_chars AS BIGINT) AS pre_chars,
             |  CAST(length(norm) AS BIGINT) AS post_chars,
             |  substr(norm, length(norm) - 2, 3) AS norm_tail
             |FROM n ORDER BY doc_id""".stripMargin)),
  )
}
