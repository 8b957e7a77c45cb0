package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-10 additions: the REAL image-decode path (the engine's last
  * stubbed component, retired with the in-JDK `javax.imageio` codec)
  * and IVF index lifecycle maintenance (occupancy drift + recenter).
  */
object Round10Queries {

  /** One-file-per-micro-batch shards of the "new" embedding batch
    * (vec_id % 10 = 0), the streaming arrival fixture for
    * `stream_ivf_append` — built once per JVM per SF like
    * `Round7Queries.incDedupShards`. */
  private[queries] def embShards(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    import s.implicits._
    Scratch.cachedDir(s"ivfstream-shards:$d") { tmp =>
      val nw = Tables.embeddings(s, d).filter($"vec_id" % 10 === 0)
      (0L until 4L).foreach { i =>
        nw.filter(pmod($"vec_id", lit(40L)) === i * 10L).coalesce(1)
          .write.mode("append").parquet(tmp.getAbsolutePath)
      }
    }.getAbsolutePath
  }

  /** Deterministic image-asset fixture shared by `m_image_decode` and
    * `m_image_resize`: per doc an 8-bit gray PNG whose dims and pixels
    * are closed-form in `doc_id` (w = 8+(id%16), h = 8+((id/16)%16),
    * pix(x,y) = (7x+13y+id) mod 256), encoded with the REAL
    * `ImageIO.write` path; docs with doc_id % 50 = 0 carry a corrupt
    * payload (decoders must sentinel, not throw).
    */
  private def imageAssets(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // spread the per-row codec work across every core BEFORE the map:
    // the sf tables arrive as one parquet file → one partition, which
    // would serialize the whole encode+decode fleet (measured 10×). A
    // real 100 TB binaryFile scan gets this parallelism for free from
    // maxPartitionBytes; the exchange here moves 8-byte ids only.
    Tables.documents(s, d).select($"doc_id").as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .map { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + ((id / 16) % 16).toInt
      val payload =
        if (id % 50 == 0) s"not an image $id".getBytes("UTF-8")
        else Multimodal.encodeGrayPng(w, h,
          (x, y) => ((x * 7 + y * 13 + id) % 256).toInt)
      (id, payload)
    }.toDF("asset_id", "payload")
  }

  /** One-file-per-micro-batch shards of the image-asset fixture — the
    * streaming arrival layout for `stream_image_ingest`, built once per
    * JVM per SF like `incDedupShards`. */
  private[queries] def imageShards(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    Scratch.cachedDir(s"imgshards:$d") { tmp =>
      val assets = imageAssets(s, d)
      (0L until 4L).foreach { i =>
        assets.filter(pmod(col("asset_id"), lit(4L)) === i).coalesce(1)
          .write.mode("append").parquet(tmp.getAbsolutePath)
      }
    }.getAbsolutePath

  def all: Seq[Q] = Seq(

    Q("stream_image_ingest",
      "STREAMING multimodal ingest — the continuous form of " +
        "m_image_decode: image payloads LAND as a file stream (4 " +
        "one-file micro-batches under maxFilesPerTrigger=1), each batch " +
        "decodes STATELESSLY through the real in-JDK codec " +
        "(Multimodal.decodeImages is a pure mapPartitions — per-arrival " +
        "cost ∝ batch, no state, no shuffle before the rollup) and the " +
        "only stateful op is the per-(ok, format) corpus health rollup " +
        "— exactly the ingest-monitor a 100 TB image pipeline runs " +
        "(decode-failure rate surfaces as the ok=false group growing). " +
        "Decode is deterministic, so the completed stream equals the " +
        "batch aggregate and the oracle replays it closed-form.",
      (s, d) => {
        import s.implicits._
        val shards = imageShards(s, d)
        val schema = s.read.parquet(shards).schema
        graft.streaming.Streams.runToMemory(s,
            s"stream_imgingest_${System.nanoTime()}") { scoped =>
          val stream = graft.streaming.Streams.fileStream(scoped, shards,
            schema, maxFilesPerTrigger = 1)
          Multimodal.decodeImages(stream).toDF()
            .groupBy($"ok", $"format")
            .agg(count(lit(1)).as("n_assets"),
              sum($"n_px").as("total_px"),
              sum($"luma_sum").as("total_luma"),
              max($"max_luma").as("peak_luma"))
        }.orderBy($"ok", $"format")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    8 + (doc_id % 16) AS w,
             |    8 + ((doc_id // 16) % 16) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, ok, w, h,
             |    flatten(list_transform(range(h), y ->
             |      list_transform(range(w),
             |        x -> (x*7 + y*13 + doc_id) % 256))) AS ps
             |  FROM g)
             |SELECT ok, CASE WHEN ok THEN 'png' ELSE '' END AS format,
             |  count(*) AS n_assets,
             |  CAST(sum(CASE WHEN ok THEN w*h ELSE 0 END) AS BIGINT)
             |    AS total_px,
             |  CAST(sum(CASE WHEN ok THEN list_sum(ps) ELSE 0 END)
             |    AS BIGINT) AS total_luma,
             |  CAST(max(CASE WHEN ok THEN list_max(ps) ELSE 0 END)
             |    AS BIGINT) AS peak_luma
             |FROM px GROUP BY 1, 2 ORDER BY ok, format""".stripMargin)),

    Q("stream_ivf_append",
      "STREAMING ANN index maintenance — e_knn_ivf_append as the live " +
        "pipeline it exists to be: new vectors ARRIVE as a stream (4 " +
        "one-file micro-batches under maxFilesPerTrigger=1), each " +
        "micro-batch is assigned to the FROZEN centroids by the fused " +
        "argmax pure map (per-arrival cost ∝ batch — no retrain, no " +
        "corpus access, no per-event shuffle) and foreachBatch APPENDS " +
        "it to the cell-partitioned at-rest layout as new files. The " +
        "updated index is then probed partition-pruned (isin asserted " +
        "inside PartitionFilters by the shared atRestProbeTopK). " +
        "Because frozen-centroid assignment is deterministic and " +
        "order-free, ARRIVAL MODE IS INVISIBLE: the oracle is exactly " +
        "e_knn_ivf_append's closed-form replay (train-on-A, " +
        "assign-all) — batch and streaming maintenance provably " +
        "converge to the same index.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val batchA = emb.filter($"vec_id" % 10 =!= 0)
        val cents = graft.similarity.Knn.kmeansCentroids(
          batchA, "vec_id", "embedding", k = 16)
        // degenerate corpus: nothing to index — empty ranked result
        // (matches the oracle on empty tables) instead of a dead stream
        if (cents.length < 2)
          Seq.empty[(Long, Long, Long)]
            .toDF("query_id", "neighbor_id", "rank")
        else {
          val shards = embShards(s, d)
          Scratch.withTempDir("graft-ivfstream-") { tmp =>
            val p = s"${tmp.getAbsolutePath}/index"
            // explicit-width keyed repartition: the single-file scan
            // otherwise funnels the assign+16-way dynamic write
            // through ONE task (r18); one file per cell either way.
            // Width data-scaled + cell-count capped (r19).
            batchA.select($"vec_id", $"embedding",
                graft.functions.vector.vec_argmax_cosine($"embedding", cents)
                  .as("cell"))
              .repartition(
                graft.ops.Width.scaled(batchA, 128L << 10, cents.length),
                $"cell")
              .write.partitionBy("cell").parquet(p)
            graft.streaming.Streams.runForeachBatch(s) { scoped =>
              graft.streaming.Streams.fileStream(scoped, shards, emb.schema,
                maxFilesPerTrigger = 1)
            } { (df, _) =>
              df.select(col("vec_id"), col("embedding"),
                  graft.functions.vector.vec_argmax_cosine(
                    col("embedding"), cents).as("cell"))
                .write.mode("append").partitionBy("cell").parquet(p)
              ()
            }
            val total = s.read.parquet(p).count()
            require(total == emb.count(),
              s"stream append lost rows: $total")
            graft.similarity.Knn.atRestProbeTopK(s, p, cents,
              emb.filter($"vec_id" < 10), "vec_id", "embedding",
              k = 5, nProbe = 3)
          }
        }
      },
      Some(OracleGen.knnIvfKmeansTrainedOnSql(dim = 64, nCells = 16,
        nProbe = 3, k = 5, maxQueryId = 10,
        trainWhere = "WHERE vec_id % 10 <> 0"))),

    Q("m_image_decode",
      "REAL image decode via the in-JDK codec (javax.imageio — zero new " +
        "dependencies): deterministic 8-bit gray PNGs are generated " +
        "in-engine from table data (per doc: dims from doc_id, pixel " +
        "(x,y) = (7x+13y+doc_id) mod 256), encoded with ImageIO.write, " +
        "then decoded by the production `Multimodal.decodeImages` " +
        "mapPartitions path — matched reader, raw raster samples, " +
        "integer-exact features (n_px, luma_sum, max_luma). Docs with " +
        "doc_id % 50 = 0 carry a CORRUPT payload and must decode to the " +
        "ok=false sentinel row instead of failing the stage (at 100 TB " +
        "some payloads WILL be truncated). The oracle replays dims and " +
        "pixel sums in closed form from the same generator, so the " +
        "codec round-trip itself — not a fake — rides the exact-hash " +
        "gate.",
      (s, d) => {
        import s.implicits._
        Multimodal.decodeImages(imageAssets(s, d)).toDF()
          .orderBy($"asset_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    8 + (doc_id % 16) AS w,
             |    8 + ((doc_id // 16) % 16) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, ok, w, h,
             |    flatten(list_transform(range(h), y ->
             |      list_transform(range(w),
             |        x -> (x*7 + y*13 + doc_id) % 256))) AS ps
             |  FROM g)
             |SELECT doc_id AS asset_id, ok,
             |  CASE WHEN ok THEN 'png' ELSE '' END AS format,
             |  CAST(CASE WHEN ok THEN w ELSE -1 END AS BIGINT) AS width,
             |  CAST(CASE WHEN ok THEN h ELSE -1 END AS BIGINT) AS height,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS n_bands,
             |  CAST(CASE WHEN ok THEN w*h ELSE 0 END AS BIGINT) AS n_px,
             |  CAST(CASE WHEN ok THEN list_sum(ps) ELSE 0 END AS BIGINT)
             |    AS luma_sum,
             |  CAST(CASE WHEN ok THEN list_max(ps) ELSE 0 END AS BIGINT)
             |    AS max_luma
             |FROM px ORDER BY asset_id""".stripMargin)),

    Q("m_image_resize",
      "REAL image resize — the thumbnailing stage of a 100 TB image " +
        "corpus, run end to end through the in-JDK codec: the shared " +
        "PNG fixture is decoded, nearest-neighbor-sampled to 10×6 with " +
        "exact integer arithmetic (dest (x,y) reads source " +
        "(x·w/10, y·h/6), floor division), re-encoded as PNG by the " +
        "production ImageIO.write path, then decoded AGAIN by " +
        "decodeImages for features — so the full decode → transform → " +
        "re-encode → decode chain rides the exact-hash gate (the oracle " +
        "replays the sampled pixel grid in closed form). Corrupt " +
        "payloads sentinel through both stages instead of failing.",
      (s, d) => {
        import s.implicits._
        val thumbs = Multimodal.resizeImages(imageAssets(s, d), 10, 6)
          .toDF().select($"asset_id", $"payload")
        Multimodal.decodeImages(thumbs).toDF().orderBy($"asset_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    8 + (doc_id % 16) AS w,
             |    8 + ((doc_id // 16) % 16) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, ok, w, h,
             |    flatten(list_transform(range(6), y ->
             |      list_transform(range(10), x ->
             |        (((x*w) // 10)*7 + ((y*h) // 6)*13 + doc_id) % 256)))
             |      AS ps
             |  FROM g)
             |SELECT doc_id AS asset_id, ok,
             |  CASE WHEN ok THEN 'png' ELSE '' END AS format,
             |  CAST(CASE WHEN ok THEN 10 ELSE -1 END AS BIGINT) AS width,
             |  CAST(CASE WHEN ok THEN 6 ELSE -1 END AS BIGINT) AS height,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS n_bands,
             |  CAST(CASE WHEN ok THEN 60 ELSE 0 END AS BIGINT) AS n_px,
             |  CAST(CASE WHEN ok THEN list_sum(ps) ELSE 0 END AS BIGINT)
             |    AS luma_sum,
             |  CAST(CASE WHEN ok THEN list_max(ps) ELSE 0 END AS BIGINT)
             |    AS max_luma
             |FROM px ORDER BY asset_id""".stripMargin)),

    Q("m_audio_decode",
      "REAL audio decode via the in-JDK codec (javax.sound.sampled — " +
        "zero new dependencies): deterministic 16-bit mono PCM WAVs are " +
        "generated in-engine from table data (per doc: 64 + (id % 192) " +
        "samples at 8 kHz, sample[i] = (31·id + 17·i) mod 2001 − 1000), " +
        "encoded by the production AudioSystem.write WAVE path, then " +
        "decoded by `Multimodal.decodeAudio` — container parse, format " +
        "sniff, integer-exact waveform features (sum, sum-abs, peak). " +
        "Docs with doc_id % 50 = 0 carry a corrupt payload and decode " +
        "to the ok=false sentinel instead of failing the stage. The " +
        "oracle replays the waveform in closed form, so the audio codec " +
        "round-trip itself rides the exact-hash gate.",
      (s, d) => {
        import s.implicits._
        // same id-only repartition as imageAssets: codec work on all
        // cores, not the scan's single input partition
        val assets = Tables.documents(s, d).select($"doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map { id =>
            val payload =
              if (id % 50 == 0) s"not audio $id".getBytes("UTF-8")
              else {
                val n = 64 + (id % 192).toInt
                Multimodal.encodePcm16Wav(8000, Array.tabulate(n)(i =>
                  ((31 * id + 17 * i) % 2001 - 1000).toShort))
              }
            (id, payload)
          }.toDF("asset_id", "payload")
        Multimodal.decodeAudio(assets).toDF().orderBy($"asset_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    64 + (doc_id % 192) AS n
             |  FROM documents),
             |wv AS (
             |  SELECT doc_id, ok, n,
             |    list_transform(range(n),
             |      i -> (31*doc_id + 17*i) % 2001 - 1000) AS ss
             |  FROM g)
             |SELECT doc_id AS asset_id, ok,
             |  CASE WHEN ok THEN 'pcm_signed' ELSE '' END AS encoding,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS channels,
             |  CAST(CASE WHEN ok THEN 8000 ELSE 0 END AS BIGINT)
             |    AS sample_rate,
             |  CAST(CASE WHEN ok THEN n ELSE 0 END AS BIGINT) AS n_samples,
             |  CAST(CASE WHEN ok THEN list_sum(ss) ELSE 0 END AS BIGINT)
             |    AS sum_sample,
             |  CAST(CASE WHEN ok THEN
             |    list_sum(list_transform(ss, x -> abs(x))) ELSE 0 END
             |    AS BIGINT) AS sum_abs,
             |  CAST(CASE WHEN ok THEN
             |    list_max(list_transform(ss, x -> abs(x))) ELSE 0 END
             |    AS BIGINT) AS peak_abs
             |FROM wv ORDER BY asset_id""".stripMargin)),

    Q("m_video_frames",
      "REAL video demux — the clean-room RIFF/AVI parser (the engine's " +
        "last codec stub, retired): per doc an uncompressed BI_RGB AVI " +
        "(1–4 frames, dims and pixels closed-form in doc_id, muxed by " +
        "the real muxAvi layout) is demuxed by " +
        "Multimodal.decodeVideoFrames — chunk walk, LIST recursion, " +
        "strf dims, bottom-up 4-byte-stride frame extraction — into one " +
        "row PER FRAME with integer-exact luma features (gray stored as " +
        "b=g=r ⇒ luma_sum = 3·Σpix), so the container round-trip rides " +
        "the exact-hash gate. Docs with doc_id % 50 = 0 carry a corrupt " +
        "payload → one ok=false sentinel row, never a failed stage. " +
        "(The MJPEG path — 00dc frames through the in-JDK JPEG codec — " +
        "rides its own digest-pinned hash gate: m_video_frames_mjpeg.)",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d).select($"doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map { id =>
            val payload =
              if (id % 50 == 0) s"not a video $id".getBytes("UTF-8")
              else {
                val w = 6 + (id % 12).toInt
                val h = 6 + ((id / 12) % 12).toInt
                val nf = 1 + (id % 4).toInt
                Multimodal.encodeAviRawGray(w, h, nf, (f, x, y) =>
                  ((7 * x + 13 * y + 31 * f + id) % 256).toInt)
              }
            (id, payload)
          }.toDF("asset_id", "payload")
        Multimodal.decodeVideoFrames(assets).toDF()
          .orderBy($"asset_id", $"frame_idx")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    6 + (doc_id % 12) AS w,
             |    6 + ((doc_id // 12) % 12) AS h,
             |    1 + (doc_id % 4) AS nf
             |  FROM documents),
             |fr AS (
             |  SELECT doc_id, w, h, unnest(range(nf)) AS f
             |  FROM g WHERE ok),
             |px AS (
             |  SELECT doc_id, w, h, f,
             |    flatten(list_transform(range(h), y ->
             |      list_transform(range(w),
             |        x -> (7*x + 13*y + 31*f + doc_id) % 256))) AS ps
             |  FROM fr)
             |SELECT doc_id AS asset_id, TRUE AS ok, f AS frame_idx,
             |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(3 * list_sum(ps) AS BIGINT) AS luma_sum,
             |  CAST(list_max(ps) AS BIGINT) AS peak_luma
             |FROM px
             |UNION ALL
             |SELECT doc_id, FALSE, CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
             |FROM g WHERE NOT ok
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    Q("e_knn_ivf_recenter",
      "IVF index lifecycle, closed — the recenter/compact half that " +
        "e_knn_ivf_append's frozen-centroid appends eventually need " +
        "(drifted batches skew cell occupancy and erode probe " +
        "pruning): the index is built the maintenance way (centroids " +
        "trained on batch A only, batch B appended to the frozen " +
        "cells), then `Knn.recenterIvfIndex` retrains on the LIVE " +
        "index contents (sample-bounded), reassigns every row with the " +
        "fused argmax kernel, and rewrites the layout one-file-per-cell " +
        "through the same crash-safe AtomicSwap rename-aside commit as " +
        "the band-index compaction. In-query assertions: row count " +
        "preserved, exactly one file per surviving cell, no leftover " +
        ".old/.compacting siblings. Probes prune the RECENTERED " +
        "layout (PartitionFilters asserted) — and because recenter " +
        "retrained on all rows, results must equal e_knn_ivf_kmeans' " +
        "trained-on-everything oracle, which is exactly what the " +
        "closed-form replay checks: maintenance is invisible to " +
        "results.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val batchA = emb.filter($"vec_id" % 10 =!= 0)
        val batchB = emb.filter($"vec_id" % 10 === 0)
        val stale = graft.similarity.Knn.kmeansCentroids(
          batchA, "vec_id", "embedding", k = 16)
        // explicit-width keyed repartition before the dynamic write
        // (the Round9 e_knn_ivf_append rationale — one task
        // otherwise); width data-scaled + cell-count capped (r19)
        def assigned(df: org.apache.spark.sql.DataFrame) =
          df.select($"vec_id", $"embedding",
            graft.functions.vector.vec_argmax_cosine($"embedding", stale)
              .as("cell"))
            .repartition(
              graft.ops.Width.scaled(df, 128L << 10, stale.length),
              $"cell")
        // degenerate corpus: nothing to index/recenter — empty ranked
        // result (matches the oracle on empty tables)
        if (stale.length < 2)
          Seq.empty[(Long, Long, Long)]
            .toDF("query_id", "neighbor_id", "rank")
        else Scratch.withTempDir("graft-ivfrecenter-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/index"
          assigned(batchA).write.partitionBy("cell").parquet(p)
          assigned(batchB).write.mode("append")
            .partitionBy("cell").parquet(p)
          val before = graft.similarity.Knn.ivfOccupancyStats(s, p)
          val cents = graft.similarity.Knn.recenterIvfIndex(
            s, p, "vec_id", "embedding", nCells = 16)
          val after = graft.similarity.Knn.ivfOccupancyStats(s, p)
          require(after.nRows == before.nRows,
            s"recenter lost rows: ${before.nRows} -> ${after.nRows}")
          // compaction half: the rewrite leaves ONE file per cell
          require(Scratch.partitionDirs(s, p, "cell=").forall(_._2 == 1),
            "recenter left multiple files in a cell")
          // the swap committed: no sibling dirs left behind
          // Hadoop-FS existence probe so the swap audit holds on
          // object-store index paths too
          require(!Scratch.pathExists(s, p + ".old") &&
            !Scratch.pathExists(s, p + ".compacting"),
            "recenter left swap siblings behind")
          graft.similarity.Knn.atRestProbeTopK(s, p, cents,
            emb.filter($"vec_id" < 10), "vec_id", "embedding",
            k = 5, nProbe = 3)
        }
      },
      Some(OracleGen.knnIvfKmeansSql(dim = 64, nCells = 16, nProbe = 3,
        k = 5, maxQueryId = 10))),
  )
}
