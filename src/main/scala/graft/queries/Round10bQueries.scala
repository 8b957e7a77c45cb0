package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-10 second wave: the multimodal DEDUP bridge (perceptual-hash
  * near-dup over real decoded images — the image analogue of
  * SimHash-Hamming), audio resampling through the real codec, and two
  * web-pipeline curation ops (URL canonicalization dedup, n-gram
  * containment via a df-capped inverted index).
  */
object Round10bQueries {

  /** Deterministic near-dup image fleet for `m_phash_neardup`: docs in
    * the same family (doc_id ∕ 4) share one non-linear base pattern;
    * member m = doc_id % 4 adds a +10·m brightness shift (dHash
    * comparisons are invariant to it) and member m = 1 additionally
    * bumps ONE sampled source pixel by +40 (flips ≤ 2 hash bits) — so
    * within-family pairs are planted near-dups at Hamming ≤ 2 while
    * cross-family grids differ in ~half their bits. Pixel values stay
    * ≤ 180+30+40 < 256: no mod-256 wrap, so the brightness shift is
    * strictly monotone and the invariance argument is exact. Docs with
    * doc_id % 50 = 0 carry a corrupt payload (hashers must sentinel).
    */
  private def phashAssets(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // id-only repartition before the encode map: codec work on all
    // cores, not the scan's single input partition (same rationale as
    // Round10Queries.imageAssets)
    Tables.documents(s, d).select($"doc_id").as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .map { id =>
        val m = (id % 4).toInt
        val seed = (((id / 4) * 2654435761L) % 1048576L).toInt
        val w = 12 + (seed % 8); val h = 12 + ((seed / 8) % 8)
        val px = 3 * w / 8; val py = 4 * h / 9 // the one perturbed pixel
        val payload =
          if (id % 50 == 0) s"not an image $id".getBytes("UTF-8")
          else Multimodal.encodeGrayPng(w, h, (x, y) =>
            ((x * 7 + y * 13 + seed) * (x + y + 3)) % 181 + 10 * m +
              (if (m == 1 && x == px && y == py) 40 else 0))
        (id, payload)
      }.toDF("asset_id", "payload")
  }

  /** Hamming-banded near-dup pairs over a (asset_id, phash) signature
    * frame: the band layout is DERIVED from the corpus count
    * ([[graft.dedup.Dedup.phashBandMasks]] — recall-exact at
    * `maxHamming` by pigeonhole for every layout it returns, widening
    * from the 3 × 21-bit small-corpus shape to AND-composite bands as
    * n² outruns the band space), each band a single bit-mask, so a
    * band bucket key is just `phash & mask`. Only in-bucket pairs pay
    * the bit_count(xor) verify. Shared by `m_phash_neardup` (reports
    * pairs) and `d_phash_clusters` (feeds them to connected
    * components). The count() keying the derivation is one action on
    * the already-checkpointed 16-byte signature frame — footer-cheap,
    * same pattern as [[graft.dedup.Dedup.semDedupAuto]].
    *
    * HOT-BUCKET CAP EXEMPTION: the output is a Hamming-VERIFIED pair
    * list (the `bit_count(xor) <= maxHamming` recheck below), so the
    * star-reduction cap is deliberately NOT applied — same contract as
    * [[graft.dedup.Dedup.minhashDuplicates]]: a star hub can be a
    * low-similarity interloper (band agreement bounds only the band's
    * bits, not the full Hamming distance), so hub pairs can FAIL the
    * verify that the true in-bucket pairs would have passed, and the
    * "star preserves components" argument does not survive a
    * post-verify filter — even `d_phash_clusters`, which consumes
    * components, takes them over VERIFIED edges. Scale safety comes
    * from the corpus-adaptive band layout instead (coincidental
    * buckets stay ~n/256 verify pairs total), and a wall of k
    * byte-identical images is collapsed by exact (digest) dedup
    * upstream — a wall of k DISTINCT images at Hamming <= t inherently
    * has k(k-1)/2 verified pairs, which no cap can bound without
    * changing the op's meaning.
    */
  private def phashPairs(ph: org.apache.spark.sql.DataFrame,
                         maxHamming: Int)
      : org.apache.spark.sql.DataFrame = {
    val masks =
      graft.dedup.Dedup.phashBandMasks(ph.count(), maxHamming)
    val bands = ph.select(col("asset_id"), posexplode(array(
        masks.map(m => col("phash").bitwiseAND(lit(m))): _*)))
      .toDF("asset_id", "band", "bits")
      .repartition(col("band"), col("bits"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bits") === col("b.bits") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("a_id"),
        col("b.asset_id").as("b_id"))
      .distinct()
    cand.join(ph.select(col("asset_id").as("a_id"),
        col("phash").as("ph_a")), "a_id")
      .join(ph.select(col("asset_id").as("b_id"),
        col("phash").as("ph_b")), "b_id")
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** One-file-per-micro-batch shards of the VAD audio fixture — the
    * streaming arrival layout for `stream_audio_ingest`, built once per
    * JVM per SF like `Round10Queries.imageShards`. */
  private[queries] def audioShards(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    import s.implicits._
    Scratch.cachedDir(s"audioshards:$d") { tmp =>
      val assets = Tables.documents(s, d).select($"doc_id").as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .map { id =>
          val payload =
            if (id % 50 == 0) s"not audio $id".getBytes("UTF-8")
            else {
              val n = 256 + (id % 256).toInt
              Multimodal.encodePcm16Wav(8000, Array.tabulate(n) { i =>
                val v =
                  if ((i / 32) % 3 == 0) (31 * id + 17 * i) % 100 - 50
                  else (31 * id + 17 * i) % 2001 - 1000
                v.toShort
              })
            }
          (id, payload)
        }.toDF("asset_id", "payload")
      (0L until 4L).foreach { i =>
        assets.filter(pmod(col("asset_id"), lit(4L)) === i).coalesce(1)
          .write.mode("append").parquet(tmp.getAbsolutePath)
      }
    }.getAbsolutePath
  }

  def all: Seq[Q] = Seq(

    Q("stream_audio_ingest",
      "STREAMING multimodal AUDIO ingest — the continuous form of " +
        "m_audio_vad's feature pass: audio payloads LAND as a file " +
        "stream (4 one-file micro-batches under maxFilesPerTrigger=1), " +
        "each batch decodes STATELESSLY through the real in-JDK codec " +
        "into per-window energies (Multimodal.audioEnergyWindows — a " +
        "pure flatMap, per-arrival cost ∝ batch, no state or shuffle " +
        "before the rollup) and the only stateful op is the corpus " +
        "health rollup per (ok, active) — exactly the ingest monitor a " +
        "100 TB audio pipeline runs (decode-failure rate AND " +
        "silence∕speech mix surface as group counts). Decode is " +
        "deterministic, so the completed stream equals the batch " +
        "aggregate and the oracle replays it closed-form.",
      (s, d) => {
        import s.implicits._
        val shards = audioShards(s, d)
        val schema = s.read.parquet(shards).schema
        graft.streaming.Streams.runToMemory(s,
            s"stream_audingest_${System.nanoTime()}") { scoped =>
          val stream = graft.streaming.Streams.fileStream(scoped, shards,
            schema, maxFilesPerTrigger = 1)
          Multimodal.audioEnergyWindows(stream, 32).toDF()
            .withColumn("active", $"ok" && $"sum_abs" > 3200)
            .groupBy($"ok", $"active")
            .agg(count(lit(1)).as("n_windows"),
              sum($"sum_abs").as("total_abs"),
              max($"sum_abs").as("peak_window"))
        }.orderBy($"ok", $"active")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    256 + (doc_id % 256) AS n
             |  FROM documents),
             |sm AS (
             |  SELECT doc_id, unnest(range(n)) AS i FROM g WHERE ok),
             |sv AS (
             |  SELECT doc_id, i // 32 AS w,
             |    CASE WHEN (i // 32) % 3 = 0
             |         THEN ((31*doc_id + 17*i) % 100) - 50
             |         ELSE (31*doc_id + 17*i) % 2001 - 1000 END AS s
             |  FROM sm),
             |win AS (
             |  SELECT doc_id, w, sum(abs(s)) AS sum_abs
             |  FROM sv GROUP BY doc_id, w),
             |rows_all AS (
             |  SELECT TRUE AS ok, (sum_abs > 3200) AS active, sum_abs
             |  FROM win
             |  UNION ALL
             |  SELECT FALSE, FALSE, 0 FROM g WHERE NOT ok)
             |SELECT ok, active,
             |  CAST(count(*) AS BIGINT) AS n_windows,
             |  CAST(sum(sum_abs) AS BIGINT) AS total_abs,
             |  CAST(max(sum_abs) AS BIGINT) AS peak_window
             |FROM rows_all GROUP BY ok, active
             |ORDER BY ok, active""".stripMargin)),

    Q("m_phash_neardup",
      "MULTIMODAL DEDUP — perceptual-hash near-dup over REAL decoded " +
        "images: the planted near-dup PNG fleet is decoded by the in-JDK " +
        "codec and difference-hashed (Multimodal.dHash63: 8×9 " +
        "integer-exact NN grid over the raster, 63 comparison bits — " +
        "brightness-invariant, single-pixel changes flip ≤ 2 bits), then " +
        "near-dup pairs are found WITHOUT a quadratic scan: Hamming " +
        "bands derived from the corpus count (Dedup.phashBandMasks — " +
        "3 × 21-bit at this scale, auto-widening to AND-composites as " +
        "n² outruns the band space) bucket the candidates (pigeonhole: " +
        "distance ≤ 2 ⇒ some band equal — recall-exact), and only " +
        "in-bucket pairs pay the bit_count(xor) verify. Signatures are " +
        "hashed ONCE (localCheckpoint) and reused by band-explode and " +
        "both verify sides — at 100 TB the images never travel, 16 " +
        "bytes/asset do. Corrupt payloads sentinel out of candidate gen. " +
        "The oracle replays grid, hash, bands, and verify in closed form " +
        "from the same pixel arithmetic, so the REAL codec round-trip " +
        "rides the exact-hash gate.",
      (s, d) => {
        import s.implicits._
        // hash once; the 16-byte signatures then serve band-explode and
        // both verify joins without re-decoding the images
        val ph = Multimodal.dHashImages(phashAssets(s, d)).toDF()
          .filter($"ok").select($"asset_id", $"phash")
          .localCheckpoint()
        phashPairs(ph, maxHamming = 2)
          .orderBy($"a_id", $"b_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, (doc_id % 4) AS m,
             |    12 + ((((doc_id // 4) * 2654435761) % 1048576) % 8) AS w,
             |    12 + (((((doc_id // 4) * 2654435761) % 1048576) // 8) % 8)
             |      AS h,
             |    ((doc_id // 4) * 2654435761) % 1048576 AS seed
             |  FROM documents WHERE doc_id % 50 <> 0),
             |grid AS (
             |  SELECT doc_id,
             |    flatten(list_transform(range(9), gy ->
             |      list_transform(range(8), gx ->
             |        (((gx*w//8)*7 + (gy*h//9)*13 + seed)
             |           * ((gx*w//8) + (gy*h//9) + 3)) % 181 + 10*m
             |        + CASE WHEN m = 1 AND (gx*w//8) = (3*w//8)
             |                 AND (gy*h//9) = (4*h//9)
             |               THEN 40 ELSE 0 END))) AS gs
             |  FROM dims),
             |ph AS (
             |  SELECT doc_id,
             |    CAST(list_sum(flatten(list_transform(range(9), gy ->
             |      list_transform(range(7), gx ->
             |        CASE WHEN gs[gy*8 + gx + 2] > gs[gy*8 + gx + 1]
             |             THEN (CAST(1 AS BIGINT) << (gy*7 + gx))
             |             ELSE CAST(0 AS BIGINT) END)))) AS BIGINT)
             |      AS phash
             |  FROM grid),
             |bands AS (
             |  SELECT doc_id, b,
             |    (phash >> CAST(21*b AS INTEGER)) & 2097151 AS bits
             |  FROM ph, (SELECT unnest(range(3)) AS b)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM bands a JOIN bands b ON a.b = b.b AND a.bits = b.bits
             |    AND a.doc_id < b.doc_id)
             |SELECT c.a_id, c.b_id,
             |  CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT)
             |    AS hamming
             |FROM cand c JOIN ph pa ON pa.doc_id = c.a_id
             |  JOIN ph pb ON pb.doc_id = c.b_id
             |WHERE bit_count(xor(pa.phash, pb.phash)) <= 2
             |ORDER BY a_id, b_id""".stripMargin)),

    Q("m_audio_resample",
      "REAL audio resample — integer-factor decimation through the " +
        "in-JDK codec BOTH ways: the m_audio_decode WAV fleet is " +
        "decoded (container parse, PCM16 sniff), every 4th sample kept " +
        "(phase 0 — exact integer decimation; a production low-pass " +
        "kernel plugs into the same loop), re-encoded at 2 kHz by the " +
        "production AudioSystem.write WAVE path, then decoded AGAIN for " +
        "features — the full decode → decimate → re-encode → decode " +
        "chain on every core. Corrupt payloads sentinel through both " +
        "stages. The oracle replays the decimated waveform in closed " +
        "form (sample j = waveform[4j]), so the chain rides the " +
        "exact-hash gate.",
      (s, d) => {
        import s.implicits._
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
        val rs = Multimodal.resampleAudio(assets, factor = 4,
            outRate = 2000).toDF()
          .select($"asset_id", $"payload")
        Multimodal.decodeAudio(rs).toDF().orderBy($"asset_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    (64 + (doc_id % 192) + 3) // 4 AS n2
             |  FROM documents),
             |wv AS (
             |  SELECT doc_id, ok, n2,
             |    list_transform(range(n2),
             |      j -> (31*doc_id + 17*(4*j)) % 2001 - 1000) AS ss
             |  FROM g)
             |SELECT doc_id AS asset_id, ok,
             |  CASE WHEN ok THEN 'pcm_signed' ELSE '' END AS encoding,
             |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS channels,
             |  CAST(CASE WHEN ok THEN 2000 ELSE 0 END AS BIGINT)
             |    AS sample_rate,
             |  CAST(CASE WHEN ok THEN n2 ELSE 0 END AS BIGINT)
             |    AS n_samples,
             |  CAST(CASE WHEN ok THEN list_sum(ss) ELSE 0 END AS BIGINT)
             |    AS sum_sample,
             |  CAST(CASE WHEN ok THEN
             |    list_sum(list_transform(ss, x -> abs(x))) ELSE 0 END
             |    AS BIGINT) AS sum_abs,
             |  CAST(CASE WHEN ok THEN
             |    list_max(list_transform(ss, x -> abs(x))) ELSE 0 END
             |    AS BIGINT) AS peak_abs
             |FROM wv ORDER BY asset_id""".stripMargin)),

    Q("curate_url_canon",
      "Web-pipeline URL canonicalization + dedup (the CCNet/RefinedWeb " +
        "URL-dedup stage): deterministic messy URLs are synthesized from " +
        "table data (mixed-case scheme/host, default :443 port, doubled " +
        "slashes, trailing slash, utm_*/fbclid tracking params, " +
        "fragments), canonicalized with one codegen'd projection — " +
        "scheme+host lowercased, default port stripped, path slashes " +
        "collapsed and trailing slash dropped, tracking params removed " +
        "and the surviving query params SORTED, fragment stripped — and " +
        "deduplicated by canonical form (n_docs per group, min doc_id " +
        "kept). Pure string functions, no UDF: the whole map side is " +
        "WholeStageCodegen and the only shuffle is the final dedup " +
        "groupBy. The oracle replays synthesis and every canonicalization " +
        "rule in SQL.",
      (s, d) => {
        import s.implicits._
        val raw = Tables.documents(s, d).select($"doc_id", concat(
          when($"doc_id" % 2 === 0, "HTTPS").otherwise("https"),
          lit("://"),
          when($"doc_id" % 3 === 0, "WWW.").otherwise("www."),
          $"source", lit(".Example.COM"),
          when($"doc_id" % 5 === 0, ":443").otherwise(""),
          lit("/Articles//"),
          floor($"doc_id" / 40).cast("long").cast("string"),
          when($"doc_id" % 2 === 0, "/").otherwise(""),
          lit("?utm_source=feed&ref="),
          ($"doc_id" % 2).cast("string"),
          lit("&utm_campaign=x"),
          when($"doc_id" % 4 === 0, "&fbclid=abc").otherwise(""),
          lit("#sec"), ($"doc_id" % 5).cast("string")).as("url"))
        raw.select($"doc_id",
            graft.text.TextOps.canonicalizeUrl($"url").as("canon_url"))
          .groupBy($"canon_url")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("keep_doc"))
          .orderBy($"canon_url")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id,
             |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
             |     || '://' ||
             |     CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END
             |     || source || '.Example.COM' ||
             |     CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
             |     '/Articles//' || CAST(doc_id // 40 AS VARCHAR) ||
             |     CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
             |     '?utm_source=feed&ref=' ||
             |     CAST(doc_id % 2 AS VARCHAR) || '&utm_campaign=x' ||
             |     CASE WHEN doc_id % 4 = 0 THEN '&fbclid=abc' ELSE '' END
             |     || '#sec' || CAST(doc_id % 5 AS VARCHAR)) AS url
             |  FROM documents),
             |pq AS (
             |  SELECT doc_id,
             |    split_part(regexp_replace(url, '#.*$', ''), '?', 1)
             |      AS base,
             |    split_part(regexp_replace(url, '#.*$', ''), '?', 2)
             |      AS query
             |  FROM raw),
             |hp AS (
             |  SELECT doc_id, query,
             |    lower(split_part(base, '://', 1)) AS scheme,
             |    split_part(split_part(base, '://', 2), '/', 1)
             |      AS hostport,
             |    substr(split_part(base, '://', 2),
             |      len(split_part(split_part(base, '://', 2), '/', 1)) + 1)
             |      AS path
             |  FROM pq),
             |canon AS (
             |  SELECT doc_id,
             |    scheme || '://' ||
             |    lower(split_part(hostport, ':', 1)) ||
             |    CASE WHEN split_part(hostport, ':', 2) = ''
             |           OR (scheme = 'https'
             |               AND split_part(hostport, ':', 2) = '443')
             |           OR (scheme = 'http'
             |               AND split_part(hostport, ':', 2) = '80')
             |         THEN '' ELSE ':' || split_part(hostport, ':', 2)
             |         END ||
             |    CASE WHEN regexp_replace(regexp_replace(path,
             |             '/{2,}', '/', 'g'), '/$', '') = ''
             |         THEN '/'
             |         ELSE regexp_replace(regexp_replace(path,
             |             '/{2,}', '/', 'g'), '/$', '') END ||
             |    CASE WHEN array_to_string(list_sort(list_filter(
             |             string_split(query, '&'),
             |             p -> NOT (starts_with(p, 'utm_')
             |               OR starts_with(p, 'fbclid=')
             |               OR starts_with(p, 'gclid=')))), '&') = ''
             |         THEN ''
             |         ELSE '?' || array_to_string(list_sort(list_filter(
             |             string_split(query, '&'),
             |             p -> NOT (starts_with(p, 'utm_')
             |               OR starts_with(p, 'fbclid=')
             |               OR starts_with(p, 'gclid=')))), '&') END
             |      AS canon_url
             |  FROM hp)
             |SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(doc_id) AS BIGINT) AS keep_doc
             |FROM canon GROUP BY canon_url ORDER BY canon_url""".stripMargin)),

    Q("d_containment",
      "Dedup: n-gram CONTAINMENT — the asymmetric overlap metric " +
        "(|A∩B| ∕ |A|) that catches quotes and subset-duplicates Jaccard " +
        "misses (a short doc fully contained in a long one has low " +
        "Jaccard but containment 1). Candidate generation is an " +
        "INVERTED 3-gram-shingle INDEX, not a quadratic scan: one typed " +
        "tokenize pass (localCheckpoint), postings grouped per shingle " +
        "in a single aggregation with the df-cap (> 50 docs dropped) " +
        "applied to the grouped list — the cap bounds per-shingle pair " +
        "fan-out at web scale and the oracle applies it identically, so " +
        "the gate stays exact — then co-occurring doc pairs generate " +
        "IN-GROUP as unordered pairs (half the shuffle volume) and " +
        "mirror after the count. Pairs are kept both directions when " +
        "containment ≥ 0.5, reported as exact integers (n_inter, n_a) " +
        "— no float thresholds.",
      (s, d) => {
        import s.implicits._
        // ONE typed pass: tokenize once, slide once (the transform +
        // element_at expression form re-splits the text per shingle —
        // interpreted HOF, O(tokens²) per doc, the round-1 pitfall;
        // measured 18 s vs ~1 s at sf0.1). split(" ", -1) keeps
        // trailing empties, mirroring the oracle's string_split.
        val t = Tables.documents(s, d).select($"doc_id", $"text")
          // the sf tables arrive as one parquet file → one partition;
          // spread tokenization across every core first
          .repartition(s.sparkContext.defaultParallelism)
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            val toks = text.split(" ", -1)
            if (toks.length < 3) Iterator.empty
            else Iterator.single(
              (id, toks.sliding(3).map(_.mkString(" ")).toArray.distinct))
          }).toDF("doc_id", "sh")
          .localCheckpoint()
        // inverted index in ONE aggregation: postings group per shingle
        // (the df-cap is a filter on the grouped list — no separate
        // df-count join), then co-occurring doc pairs are generated
        // in-group as UNORDERED pairs — half the pair-shuffle volume —
        // and mirrored after the count (n_inter is symmetric). vs the
        // ex⋈ex self-join formulation: one string shuffle instead of
        // two SMJ sorts, measured 5.7 → ~2.5 s at sf0.1.
        val ex = t.select($"doc_id", explode($"sh").as("s"))
        val up = ex.groupBy($"s").agg(collect_list($"doc_id").as("ids"))
          .filter(size($"ids") <= 50)
          .select($"ids").as[Seq[Long]]
          .flatMap { ids =>
            val a = ids.toArray
            val buf = Seq.newBuilder[(Long, Long)]
            var i = 0
            while (i < a.length) {
              var j = i + 1
              while (j < a.length) {
                buf += (if (a(i) < a(j)) (a(i), a(j)) else (a(j), a(i)))
                j += 1
              }
              i += 1
            }
            buf.result()
          }.toDF("lo", "hi")
          .groupBy($"lo", $"hi").agg(count(lit(1)).as("n_inter"))
        val shared = up.select($"lo".as("a_id"), $"hi".as("b_id"),
            $"n_inter")
          .union(up.select($"hi".as("a_id"), $"lo".as("b_id"),
            $"n_inter"))
        shared.join(t.select($"doc_id".as("a_id"),
            size($"sh").cast("long").as("n_a")), "a_id")
          .filter($"n_inter" * 2 >= $"n_a")
          .select($"a_id", $"b_id", $"n_inter", $"n_a")
          .orderBy($"a_id", $"b_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(
             |      range(len(string_split(text, ' ')) - 2),
             |      i -> string_split(text, ' ')[i+1] || ' ' ||
             |           string_split(text, ' ')[i+2] || ' ' ||
             |           string_split(text, ' ')[i+3])) AS sh
             |  FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3),
             |ex AS (SELECT doc_id, unnest(sh) AS s FROM t),
             |keep AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 50),
             |ex2 AS (SELECT ex.doc_id, ex.s FROM ex JOIN keep USING (s)),
             |shared AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(count(*) AS BIGINT) AS n_inter
             |  FROM ex2 a JOIN ex2 b
             |    ON a.s = b.s AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2),
             |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_a FROM t)
             |SELECT shared.a_id, shared.b_id, shared.n_inter, sz.n_a
             |FROM shared JOIN sz ON sz.doc_id = shared.a_id
             |WHERE 2 * shared.n_inter >= sz.n_a
             |ORDER BY a_id, b_id""".stripMargin)),

    Q("m_video_scene_cut",
      "Video SCENE-CUT detection on top of the real RIFF/AVI demux — " +
        "the shot-boundary pass a video curation pipeline runs before " +
        "frame sampling: per doc a 4-frame AVI whose pixels are constant " +
        "within a scene (scene = frame ∕ 2) and jump at the boundary is " +
        "demuxed by Multimodal.decodeVideoFrames (real muxer + real " +
        "parser), then a lag window over (asset, frame_idx) turns the " +
        "integer-exact per-frame luma sums into frame-to-frame deltas — " +
        "within-scene deltas are exactly 0, the planted cut at frame 2 " +
        "is a large positive delta. One window exchange per asset, no " +
        "decode past the per-frame sums. Corrupt payloads (doc_id % 50 " +
        "= 0) sentinel out before the window. The oracle replays frame " +
        "sums and the lag in closed form.",
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
                Multimodal.encodeAviRawGray(w, h, 4, (f, x, y) =>
                  ((7 * x + 13 * y + 97 * (f / 2) + id) % 256).toInt)
              }
            (id, payload)
          }.toDF("asset_id", "payload")
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy($"asset_id").orderBy($"frame_idx")
        Multimodal.decodeVideoFrames(assets).toDF()
          .filter($"ok")
          .withColumn("prev", lag($"luma_sum", 1).over(win))
          .filter($"prev".isNotNull)
          .select($"asset_id", $"frame_idx",
            abs($"luma_sum" - $"prev").cast("long").as("delta"),
            (abs($"luma_sum" - $"prev") > 0).as("is_cut"))
          .orderBy($"asset_id", $"frame_idx")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    6 + (doc_id % 12) AS w, 6 + ((doc_id // 12) % 12) AS h
             |  FROM documents),
             |fr AS (SELECT doc_id, w, h, unnest(range(4)) AS f
             |       FROM g WHERE ok),
             |px AS (
             |  SELECT doc_id, f,
             |    CAST(3 * list_sum(flatten(list_transform(range(h), y ->
             |      list_transform(range(w),
             |        x -> (7*x + 13*y + 97*(f//2) + doc_id) % 256))))
             |      AS BIGINT) AS luma_sum
             |  FROM fr),
             |lagd AS (
             |  SELECT doc_id AS asset_id, f AS frame_idx, luma_sum,
             |    lag(luma_sum) OVER (PARTITION BY doc_id ORDER BY f)
             |      AS prev
             |  FROM px)
             |SELECT asset_id, frame_idx,
             |  CAST(abs(luma_sum - prev) AS BIGINT) AS delta,
             |  (abs(luma_sum - prev) > 0) AS is_cut
             |FROM lagd WHERE prev IS NOT NULL
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    Q("t_token_surprisal",
      "Quality scoring: corpus-frequency SURPRISAL proxy — the heuristic " +
        "stand-in for a KenLM perplexity filter: every token joins its " +
        "CORPUS term frequency (one tokenize-once typed pass feeds both " +
        "the tf aggregation and the join — the tf table is vocab-sized, " +
        "so the join back is a broadcast at any corpus scale), and each " +
        "doc reports exact integers: token count, distinct types, " +
        "Σ corpus-tf over its token instances (low mean ⇒ rare-token-" +
        "heavy ⇒ surprising) and its rarest token's corpus tf. No " +
        "floats — the downstream filter divides once at the consumer.",
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d).select($"doc_id", $"text")
          .repartition(s.sparkContext.defaultParallelism)
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            text.split(" ", -1).iterator.map(t => (id, t))
          }).toDF("doc_id", "tk")
          .localCheckpoint() // tokenize once: tf agg + join share it
        val tf = tok.groupBy($"tk").agg(count(lit(1)).as("ctf"))
        tok.join(tf, "tk")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct($"tk").as("n_types"),
            sum($"ctf").as("sum_ctf"),
            min($"ctf").as("min_ctf"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk
             |  FROM documents),
             |tf AS (SELECT tk, count(*) AS ctf FROM tok GROUP BY tk)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(count(DISTINCT tk) AS BIGINT) AS n_types,
             |  CAST(sum(ctf) AS BIGINT) AS sum_ctf,
             |  CAST(min(ctf) AS BIGINT) AS min_ctf
             |FROM tok JOIN tf USING (tk)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("m_audio_vad",
      "Audio ACTIVITY segmentation (the VAD / silence-trim pass of an " +
        "audio curation pipeline) through the real codec: per doc a WAV " +
        "whose waveform alternates loud and quiet stretches (every 3rd " +
        "32-sample window is low-amplitude) is decoded by the in-JDK " +
        "codec and reduced to per-window Σ|sample| IN THE DECODE LOOP " +
        "(Multimodal.audioEnergyWindows — no per-sample rows ever " +
        "materialize; a 100 TB corpus emits n∕32 rows), windows flag " +
        "active on an exact integer energy threshold, and a " +
        "gaps-and-islands window pass (w − row_number) merges " +
        "consecutive active windows into segments with start / length " +
        "/ exact energy. Corrupt payloads (doc_id % 50 = 0) sentinel " +
        "out before the window. The oracle replays waveform, windows, " +
        "threshold, and islands in closed form.",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d).select($"doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map { id =>
            val payload =
              if (id % 50 == 0) s"not audio $id".getBytes("UTF-8")
              else {
                val n = 256 + (id % 256).toInt
                Multimodal.encodePcm16Wav(8000, Array.tabulate(n) { i =>
                  val v =
                    if ((i / 32) % 3 == 0) (31 * id + 17 * i) % 100 - 50
                    else (31 * id + 17 * i) % 2001 - 1000
                  v.toShort
                })
              }
            (id, payload)
          }.toDF("asset_id", "payload")
        val win = Multimodal.audioEnergyWindows(assets, 32).toDF()
          .filter($"ok")
          .withColumn("active", $"sum_abs" > 3200)
        val isl = win.withColumn("grp", $"w" - row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"asset_id", $"active").orderBy($"w")))
        isl.filter($"active")
          .groupBy($"asset_id", $"grp")
          .agg(min($"w").as("seg_start"),
            count(lit(1)).as("seg_windows"),
            sum($"sum_abs").as("seg_energy"))
          .select($"asset_id", $"seg_start", $"seg_windows",
            $"seg_energy")
          .orderBy($"asset_id", $"seg_start")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, (doc_id % 50 <> 0) AS ok,
             |    256 + (doc_id % 256) AS n
             |  FROM documents),
             |sm AS (
             |  SELECT doc_id, unnest(range(n)) AS i FROM g WHERE ok),
             |sv AS (
             |  SELECT doc_id, i, i // 32 AS w,
             |    CASE WHEN (i // 32) % 3 = 0
             |         THEN ((31*doc_id + 17*i) % 100) - 50
             |         ELSE (31*doc_id + 17*i) % 2001 - 1000 END AS s
             |  FROM sm),
             |win AS (
             |  SELECT doc_id, w, sum(abs(s)) AS sum_abs,
             |    (sum(abs(s)) > 3200) AS active
             |  FROM sv GROUP BY doc_id, w),
             |isl AS (
             |  SELECT doc_id, w, sum_abs, active,
             |    w - row_number() OVER (PARTITION BY doc_id, active
             |      ORDER BY w) AS grp
             |  FROM win)
             |SELECT doc_id AS asset_id,
             |  CAST(min(w) AS BIGINT) AS seg_start,
             |  CAST(count(*) AS BIGINT) AS seg_windows,
             |  CAST(sum(sum_abs) AS BIGINT) AS seg_energy
             |FROM isl WHERE active GROUP BY doc_id, grp
             |ORDER BY asset_id, seg_start""".stripMargin)),

    Q("p_curriculum_order",
      "Curriculum training order — the easy→hard schedule a trainer " +
        "pages: documents bucket into difficulty PHASES by " +
        "data-independent length thresholds (phase = min(4, " +
        "1 + n_chars∕150) — fixed config, not a global ntile, so no " +
        "single-partition window ever exists), each phase is " +
        "deterministically shuffled by md5('curr7:' || doc_id) (same " +
        "permutation on any engine / cluster size / retry — the " +
        "p_epoch_shuffle seed pattern), and the trainer's page is a " +
        "per-phase rank ≤ 25 — WindowGroupLimit pushes the limit below " +
        "the phase exchange, so each map task keeps a 25-row heap and " +
        "the full corpus is never sorted. Exactly how curriculum " +
        "phases are paged at 100 TB: rank ranges per phase, never a " +
        "materialized global order.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", $"n_chars",
            least(lit(4L), lit(1L) +
              floor($"n_chars" / 150).cast("long")).as("phase"),
            md5(concat(lit("curr7:"), $"doc_id".cast("string")))
              .as("rk"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"phase").orderBy($"rk")
        docs.withColumn("pos", row_number().over(w).cast("long"))
          .filter($"pos" <= 25)
          .select($"phase", $"pos", $"doc_id", $"n_chars")
          .orderBy($"phase", $"pos")
      },
      Some("""SELECT phase, pos, doc_id, n_chars FROM (
             |  SELECT CAST(least(4, 1 + n_chars // 150) AS BIGINT)
             |      AS phase,
             |    doc_id, n_chars,
             |    CAST(row_number() OVER (
             |      PARTITION BY least(4, 1 + n_chars // 150)
             |      ORDER BY md5('curr7:' || CAST(doc_id AS VARCHAR)))
             |      AS BIGINT) AS pos
             |  FROM documents) t
             |WHERE pos <= 25 ORDER BY phase, pos""".stripMargin)),

    Q("d_phash_clusters",
      "The multimodal dedup ACTION — image near-dup pairs reduced to " +
        "clusters and one KEPT image each: dHash signatures from the " +
        "real decoded fleet feed the Hamming-banded pair generation " +
        "(shared with m_phash_neardup), large-star/small-star connected " +
        "components (Dedup.duplicateClusters — O(log n) rounds) " +
        "resolve transitive near-dup groups, and one window picks the " +
        "canonical member per cluster (largest real-decoded n_px, " +
        "asset_id tiebreak) with the kept/dropped audit trail a " +
        "curation pipeline records. The oracle replays hash → bands → " +
        "verify in closed form and the components with an independent " +
        "algorithm (recursive CTE) plus the same argmax.",
      (s, d) => {
        import s.implicits._
        // ONE codec pass: the dHash decode carries dims, so both the
        // signature and the canonical-selection n_px come from it
        val ph = Multimodal.dHashImages(phashAssets(s, d)).toDF()
          .filter($"ok")
          .select($"asset_id", $"phash",
            ($"width" * $"height").as("n_px"))
          .localCheckpoint()
        val pairs = phashPairs(ph, maxHamming = 2)
        val clusters = graft.dedup.Dedup.duplicateClusters(
            ph.select($"asset_id"),
            pairs.select($"a_id", $"b_id"), "asset_id")
          .withColumnRenamed("id", "asset_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"cluster_id").orderBy($"n_px".desc, $"asset_id")
        clusters.join(ph.select($"asset_id", $"n_px"), Seq("asset_id"))
          .withColumn("rk", row_number().over(w))
          .groupBy($"cluster_id")
          .agg(max(when($"rk" === 1, $"asset_id")).as("kept_asset"),
            max(when($"rk" === 1, $"n_px")).as("kept_px"),
            count(lit(1)).as("n_members"),
            (count(lit(1)) - 1).as("n_dropped"))
          .orderBy($"cluster_id")
      },
      Some("""WITH RECURSIVE dims AS (
             |  SELECT doc_id, (doc_id % 4) AS m,
             |    12 + ((((doc_id // 4) * 2654435761) % 1048576) % 8) AS w,
             |    12 + (((((doc_id // 4) * 2654435761) % 1048576) // 8) % 8)
             |      AS h,
             |    ((doc_id // 4) * 2654435761) % 1048576 AS seed
             |  FROM documents WHERE doc_id % 50 <> 0),
             |grid AS (
             |  SELECT doc_id,
             |    flatten(list_transform(range(9), gy ->
             |      list_transform(range(8), gx ->
             |        (((gx*w//8)*7 + (gy*h//9)*13 + seed)
             |           * ((gx*w//8) + (gy*h//9) + 3)) % 181 + 10*m
             |        + CASE WHEN m = 1 AND (gx*w//8) = (3*w//8)
             |                 AND (gy*h//9) = (4*h//9)
             |               THEN 40 ELSE 0 END))) AS gs
             |  FROM dims),
             |ph AS (
             |  SELECT doc_id,
             |    CAST(list_sum(flatten(list_transform(range(9), gy ->
             |      list_transform(range(7), gx ->
             |        CASE WHEN gs[gy*8 + gx + 2] > gs[gy*8 + gx + 1]
             |             THEN (CAST(1 AS BIGINT) << (gy*7 + gx))
             |             ELSE CAST(0 AS BIGINT) END)))) AS BIGINT)
             |      AS phash
             |  FROM grid),
             |bands AS (
             |  SELECT doc_id, b,
             |    (phash >> CAST(21*b AS INTEGER)) & 2097151 AS bits
             |  FROM ph, (SELECT unnest(range(3)) AS b)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM bands a JOIN bands b ON a.b = b.b AND a.bits = b.bits
             |    AND a.doc_id < b.doc_id),
             |e AS (
             |  SELECT c.a_id AS a, c.b_id AS b
             |  FROM cand c JOIN ph pa ON pa.doc_id = c.a_id
             |    JOIN ph pb ON pb.doc_id = c.b_id
             |  WHERE bit_count(xor(pa.phash, pb.phash)) <= 2),
             |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS lab FROM ph
             |  UNION
             |  SELECT ee.b, reach.lab FROM reach
             |  JOIN ee ON ee.a = reach.id),
             |cl AS (
             |  SELECT id AS asset_id, CAST(min(lab) AS BIGINT)
             |    AS cluster_id
             |  FROM reach GROUP BY id),
             |npx AS (SELECT doc_id AS asset_id,
             |  CAST(w * h AS BIGINT) AS n_px FROM dims),
             |rk AS (
             |  SELECT cl.cluster_id, cl.asset_id, npx.n_px,
             |    row_number() OVER (PARTITION BY cl.cluster_id
             |      ORDER BY npx.n_px DESC, cl.asset_id) AS rk
             |  FROM cl JOIN npx USING (asset_id))
             |SELECT cluster_id,
             |  CAST(max(CASE WHEN rk = 1 THEN asset_id END) AS BIGINT)
             |    AS kept_asset,
             |  CAST(max(CASE WHEN rk = 1 THEN n_px END) AS BIGINT)
             |    AS kept_px,
             |  CAST(count(*) AS BIGINT) AS n_members,
             |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
             |FROM rk GROUP BY cluster_id
             |ORDER BY cluster_id""".stripMargin)),
  )
}
