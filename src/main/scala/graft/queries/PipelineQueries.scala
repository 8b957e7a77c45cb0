package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Knn
import graft.streaming.Streams
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The large-scale training-data-pipeline operator suite (builder mandate:
  * dedup, similarity search, multimodal columns, text analysis), phrased
  * over the `documents` and `embeddings` harness tables. Nearly everything
  * is oracle-exact against DuckDB — including the ANN/LSH/simhash family,
  * whose hashes and float kernels are reproduced bit-for-bit in generated
  * SQL (`OracleGen`). Only queries built on engine-specific hashing with
  * modular arithmetic (minhash's 2-hash scheme wraps 64-bit ints, which
  * SQL BIGINT refuses) or engine-specific sketches (HLL) stay rows-only.
  */
object PipelineQueries {

  def all: Seq[Q] = Seq(

    Q("t_token_count",
      "Text analysis: whitespace token counting (codegen'd split, no UDF).",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextOps.tokenCount($"text").as("n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(string_split_regex(trim(text), '\s+')) END
             |    AS BIGINT) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t_quality_features",
      "Text analysis: quality-score features as exact integer columns " +
        "(char/token/non-space counts) — one projection, zero shuffles.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            length($"text").cast("long").as("n_chars_m"),
            length(regexp_replace($"text", "\\s+", "")).cast("long")
              .as("n_nospace"),
            TextOps.tokenCount($"text").as("n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_chars_m,
             |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
             |    AS n_nospace,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |    AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t_lang_id",
      "Text analysis: n-gram/stopword language-ID heuristic (expression-" +
        "only argmax over marker-word hits). Oracle: the marker lists are " +
        "expanded into SQL from the SAME TextOps constant, argmax via " +
        "list_max over (score, lang) structs.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"lang",
            TextOps.langId($"text").as("pred_lang"))
          .orderBy($"doc_id")
      },
      Some(OracleGen.langIdSql)),

    Q("t_fingerprint",
      "Text analysis: document fingerprint over normalized text " +
        "(whitespace-collapsed, lowercased) — md5 variant for oracle " +
        "parity; engine API also exposes xxhash64.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            md5(regexp_replace(lower(trim($"text")), "\\s+", " "))
              .as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("d_exact_dedup",
      "Dedup: exact content-hash groupBy — shuffles 16-byte digests, " +
        "never full texts.",
      (s, d) => {
        import s.implicits._
        Dedup.exact(Tables.documents(s, d), "text", "doc_id")
          .orderBy($"content_hash")
      },
      Some("""SELECT md5(text) AS content_hash,
             |  min(doc_id) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY md5(text)
             |ORDER BY content_hash""".stripMargin)),

    Q("d_minhash_lsh",
      "Dedup: MinHash+LSH — shingle → k minhashes → banded bucket self-" +
        "join; per-doc candidate counts. The portable 60-bit md5-prefix " +
        "hash scheme (2-hash permutations in Z_2^60, no 64-bit wraparound) " +
        "makes the whole LSH pipeline oracle-exact; the faster murmur " +
        "variant (same shape) stays the 100 TB default, spec-verified.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val cands = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2)
        val perDoc = cands.select($"a_id".as("doc_id"))
          .union(cands.select($"b_id".as("doc_id")))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_candidates"))
        docs.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_candidates"))
          .orderBy($"doc_id")
      },
      Some(OracleGen.minhashLshSql(shingleN = 3, bands = 8,
        rowsPerBand = 2))),

    Q("d_minhash_verify",
      "Dedup: the full MinHash pipeline — LSH candidates re-checked with " +
        "exact n-gram Jaccard ≥ 0.3 (shingle recomputation touches only " +
        "candidate ids, not the corpus). Portable md5 hashing → the " +
        "candidates AND the verify stage are oracle-exact.",
      (s, d) => {
        import s.implicits._
        // 4 bands × 4 rows: same 16 hashes as 8×2 but band collisions go
        // with sim⁴ not sim² — an order of magnitude fewer false
        // candidates reach the exact-Jaccard verify stage
        Dedup.minhashDuplicatesPortable(Tables.documents(s, d), "doc_id",
            "text", threshold = 0.3, shingleN = 3, bands = 4,
            rowsPerBand = 4)
          .orderBy($"a_id", $"b_id")
      },
      Some(OracleGen.minhashVerifySql(shingleN = 3, bands = 4,
        rowsPerBand = 4, threshold = 0.3))),

    Q("d_simhash",
      "Dedup: SimHash signatures (per-bit majority over token hashes, one " +
        "typed pass). The 60-bit md5-prefix token hash is engine-portable, " +
        "so the signature itself is oracle-exact; the murmur variant stays " +
        "the throughput default.",
      (s, d) => {
        import s.implicits._
        Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text",
            tokenHash = "md5")
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some(OracleGen.simhashMd5Sql)),

    Q("d_ngram_jaccard",
      "Dedup: n-gram Jaccard verify — token-set overlap within source " +
        "groups, exact integer intersect/union sizes.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .filter($"doc_id" < 100)
          .select($"doc_id", $"source",
            array_distinct(split($"text", " ")).as("toks"))
        val a = docs.as("a"); val b = docs.as("b")
        a.join(b, col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            size(array_intersect(col("a.toks"), col("b.toks"))).cast("long")
              .as("n_inter"),
            size(array_union(col("a.toks"), col("b.toks"))).cast("long")
              .as("n_union"))
          .orderBy($"a_id", $"b_id")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    list_distinct(string_split(text, ' ')) AS toks
             |  FROM documents WHERE doc_id < 100)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
             |    AS n_inter,
             |  CAST(len(list_distinct(list_concat(a.toks, b.toks)))
             |    AS BIGINT) AS n_union
             |FROM t a JOIN t b
             |  ON a.source = b.source AND a.doc_id < b.doc_id
             |ORDER BY a_id, b_id""".stripMargin)),

    Q("d_embedding_neardup",
      "Dedup: embedding-cosine near-dup via random-hyperplane LSH buckets " +
        "+ in-bucket exact cosine (engine hash planes → rows-only).",
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.embeddingNearDup(Tables.embeddings(s, d),
          "vec_id", "embedding", threshold = 0.5, nPlanes = 4)
        // per-vector near-dup degree: always one row per vector
        Tables.embeddings(s, d).select($"vec_id")
          .join(pairs.select($"a_id".as("vec_id"))
              .union(pairs.select($"b_id".as("vec_id")))
              .groupBy($"vec_id").agg(count(lit(1)).as("n_neardups")),
            Seq("vec_id"), "left")
          .na.fill(0L, Seq("n_neardups"))
          .orderBy($"vec_id")
      },
      Some(OracleGen.embeddingNearDupSql(dim = 64, nPlanes = 4,
        threshold = 0.5))),

    Q("e_knn_brute",
      "Similarity: brute-force cosine top-k (broadcast queries, corpus " +
        "streams; zip_with/aggregate dot products, no UDF).",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Knn.bruteForceTopK(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", k = 5)
          .select($"query_id", $"neighbor_id", $"rank".cast("long")
            .as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnBruteSql(dim = 64, k = 5, maxQueryId = 10))),

    Q("e_knn_lsh",
      "Similarity: LSH-bucketed ANN top-k — the scale path (probe one " +
        "bucket + one-flip neighbors instead of the corpus). Oracle-exact: " +
        "the ±1 plane signs are expanded into SQL from the same splitmix64 " +
        "the kernel evaluates; ranks compare on bit-identical doubles.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Knn.lshTopK(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", k = 5, nPlanes = 4)
          .select($"query_id", $"neighbor_id", $"rank".cast("long")
            .as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnLshSql(dim = 64, nPlanes = 4, k = 5,
        maxQueryId = 10))),

    Q("e_knn_ivf",
      "Similarity: IVF-style ANN — data-adaptive centroid cells (portable " +
        "md5-ordered sample), nProbe nearest cells probed per query. " +
        "Oracle-exact: cell assignment and ranks reproduce bit-for-bit.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Knn.ivfTopK(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", k = 5, nCells = 16, nProbe = 3)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnIvfSql(dim = 64, nCells = 16, nProbe = 3, k = 5,
        maxQueryId = 10))),

    Q("m_multimodal_meta",
      "Multimodal: binary-column plumbing — payload bytes + typed " +
        "metadata; byte length oracle-checked. (The codec tier above " +
        "this plumbing is real and separately gated: m_image_decode / " +
        "m_image_resize / m_audio_decode / m_video_frames.)",
      (s, d) => {
        import s.implicits._
        Multimodal.asBinaryAssets(Tables.documents(s, d), "doc_id", "text")
          .select($"asset_id", $"media_type", $"n_bytes")
          .orderBy($"asset_id")
      },
      Some("""SELECT doc_id AS asset_id, 'image/fake' AS media_type,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             |FROM documents ORDER BY asset_id""".stripMargin)),

    Q("t_oov_rate",
      "Text analysis: per-doc out-of-vocabulary token counts vs the " +
        "corpus top-20 vocabulary — explode (the UDTF surface, SURVEY " +
        "§2.8) + broadcast vocab join + re-aggregation, all integers.",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"doc_id", explode(split(trim($"text"), "\\s+"))
            .as("tok"))
        val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("freq"))
          .orderBy($"freq".desc, $"tok").limit(20)
          .select($"tok", lit(1).as("known"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when($"known".isNull, 1).otherwise(0)).cast("long")
              .as("n_oov"))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
             |    AS tok FROM documents),
             |vocab AS (
             |  SELECT tok FROM (SELECT tok, count(*) AS freq FROM toks
             |    GROUP BY tok ORDER BY freq DESC, tok LIMIT 20))
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov
             |FROM toks LEFT JOIN vocab v USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("w_sessionize",
      "Window composition: gap-based sessionization — lag() marks session " +
        "starts (> 6h gap), running sum assigns session ids; output " +
        "per-user session counts (all integers).",
      (s, d) => {
        import s.implicits._
        val byUser = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy($"ts", $"event_id")
        val marked = Tables.events(s, d)
          .withColumn("prev_ts", lag($"ts", 1).over(byUser))
          .withColumn("new_session",
            // exact microsecond arithmetic — unix_timestamp would FLOOR to
            // seconds and disagree with the oracle on sub-second gaps
            when($"prev_ts".isNull ||
              unix_micros($"ts") - unix_micros($"prev_ts") > 21600000000L,
              1).otherwise(0))
        marked.groupBy($"user_id")
          .agg(sum($"new_session").cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id,
             |    CASE WHEN prev_ts IS NULL
             |      OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM (SELECT user_id, ts, event_id,
             |          lag(ts) OVER (PARTITION BY user_id
             |            ORDER BY ts, event_id) AS prev_ts
             |        FROM events) t)
             |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |  count(*) AS n_events
             |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("curate_corpus",
      "Composite training-data curation: quality gate (token count + char " +
        "length) → exact dedup (keep min doc_id per digest) → per-(lang, " +
        "source) stats — one fused plan: scan-side filters, a single " +
        "digest shuffle, one aggregation. The canonical pre-training " +
        "corpus pass.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val quality = docs
          // n_tokens' defining tokenize is PINNED (r19, guide §4.4):
          // unpinned, the filter below is alias-substituted under
          // the projection and every doc splits TWICE (plan audit:
          // split(trim(text)) in both the Filter and the Project)
          .withColumn("n_tokens",
            graft.functions.text.pinned(TextOps.tokenCount($"text")))
          .filter($"n_tokens" >= 20 && length($"text") >= 100)
        // keep-min-doc dedup as ONE aggregation (min_by of the full row)
        // instead of window+filter — halves the shuffles on this path
        val kept = quality
          .groupBy(md5($"text").as("content_hash"))
          .agg(min_by(struct($"doc_id", $"lang", $"source", $"n_tokens"),
            $"doc_id").as("r"))
          .select($"r.doc_id", $"r.lang", $"r.source", $"r.n_tokens")
        kept.groupBy($"lang", $"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            min($"doc_id").as("first_doc"))
          .orderBy($"lang", $"source")
      },
      Some("""WITH quality AS (
             |  SELECT doc_id, lang, source, text,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |      AS n_tokens
             |  FROM documents
             |  WHERE len(string_split_regex(trim(text), '\s+')) >= 20
             |    AND length(text) >= 100),
             |kept AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
             |    ORDER BY doc_id) AS rk FROM quality)
             |SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  min(doc_id) AS first_doc
             |FROM kept WHERE rk = 1
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    Q("t_token_bpe",
      "Text analysis: BPE-ish token estimate — words + punctuation runs " +
        "counted separately, approximating subword tokenizers without a " +
        "vocab file. Pure column arithmetic, oracle-exact.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextOps.tokenCountBpeIsh($"text").as("n_bpe"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(string_split_regex(trim(text), '\s+')) +
             |      (length(text) -
             |       length(regexp_replace(text, '[[:punct:]]', '', 'g')))
             |    END AS BIGINT) AS n_bpe
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("e_knn_sql",
      "SQL surface for the native vector expressions: vec_cosine is " +
        "registered through SparkSessionExtensions/FunctionRegistry, so " +
        "plain spark.sql text plans and codegens it like a built-in — " +
        "brute-force top-3 written entirely in SQL.",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.embeddings(s, d).createOrReplaceTempView("graft_emb")
        s.sql("""
          WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
                     FROM graft_emb WHERE vec_id < 5),
          scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   vec_cosine(q.q_vec, e.embedding) AS cos
            FROM graft_emb e JOIN q ON e.vec_id <> q.query_id)
          SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
          FROM (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn
                FROM scored) t
          WHERE rn <= 3 ORDER BY query_id, rank""")
      },
      Some(OracleGen.knnBruteSql(dim = 64, k = 3, maxQueryId = 5))),

    Q("stream_sessionize",
      "Streaming custom state: flatMapGroupsWithState sessionization — " +
        "per-user (lastTs, counters) state carried across batches; on the " +
        "static table this equals the batch window sessionization " +
        "(oracle-checked against the same SQL as w_sessionize).",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemoryAppend(s,
            s"stream_sessions_${System.nanoTime()}") { scoped =>
            // maxFilesPerTrigger=MaxValue: the whole static input must land
            // in ONE batch — multi-batch append emits one cumulative row per
            // user PER batch and the memory sink would accumulate them
            val stream = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            Streams.streamingSessionCounts(stream,
              gapMicros = 21600000000L)
          }
          .orderBy($"user_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id,
             |    CASE WHEN prev_ts IS NULL
             |      OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM (SELECT user_id, ts, event_id,
             |          lag(ts) OVER (PARTITION BY user_id
             |            ORDER BY ts, event_id) AS prev_ts
             |        FROM events) t)
             |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |  count(*) AS n_events
             |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("t_chunk_text",
      "Training-data prep: context-window chunking — overlapping windows " +
        "of 50 tokens, stride 40, one typed pass (tokenize once per doc). " +
        "Row-multiplying UDTF surface done scan-side; oracle via per-row " +
        "range unnest + list slicing.",
      (s, d) => {
        import s.implicits._
        TextOps.chunkTokens(Tables.documents(s, d), "doc_id", "text",
            window = 50, stride = 40)
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents WHERE length(trim(text)) > 0),
             |c AS (SELECT doc_id, toks,
             |    unnest(range((len(toks) - 1) // 40 + 1)) AS ci
             |  FROM t)
             |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
             |  array_to_string(toks[ci*40 + 1 : ci*40 + 50], ' ') AS chunk
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    Q("j8_range_join",
      "Beyond-reference join surface: interval (band) join — purchases " +
        "within 5 minutes after a click of the same user. Banding turns " +
        "the O(n²)-per-key theta join into an equi join on (user, band) " +
        "with the exact range filtered inside ~2-band candidates.",
      (s, d) => {
        import graft.ops.Relational
        import s.implicits._
        val ev = Tables.events(s, d)
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"),
            unix_micros($"ts").as("c_us"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"),
            unix_micros($"ts").as("p_us"))
        Relational.bandJoin(clicks, purchases, Seq("user_id"),
            leftTsUs = "c_us", rightTsUs = "p_us",
            maxGapUs = 300000000L)
          .select($"click_id", $"purchase_id",
            ($"p_us" - $"c_us").as("gap_us"))
          .orderBy($"click_id", $"purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000 AS gap_us
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             |  AND c.event_type = 'click' AND p.event_type = 'purchase'
             |  AND epoch_ns(p.ts) // 1000 > epoch_ns(c.ts) // 1000
             |  AND epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000
             |      <= 300000000
             |ORDER BY click_id, purchase_id""".stripMargin)),

    Q("j7_asof_join",
      "Beyond-reference join surface: as-of join — each purchase event " +
        "picks the latest strictly-earlier click of the same user. " +
        "Spark side: union + one window (merge shape, one shuffle), no " +
        "range-join explosion; oracle: DuckDB's native ASOF JOIN — an " +
        "independent algorithm agreeing on every row.",
      (s, d) => {
        import graft.ops.Relational
        import s.implicits._
        val ev = Tables.events(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"),
            $"ts".as("prior_click_ts"))
        Relational.asofJoin(purchases, clicks, Seq("user_id"),
            leftTs = "ts", rightTs = "click_ts",
            valueCols = Seq("prior_click_ts"), strict = true)
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events
             |  WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us
             |  FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, make_timestamp(p.ts_us) AS ts,
             |  make_timestamp(c.ts_us) AS prior_click_ts
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.ts_us > c.ts_us
             |ORDER BY p.event_id""".stripMargin)),

    Q("w_rolling_window",
      "Window frames: rolling 5-row sum + count per user over event time " +
        "— exact integer cents so the sliding aggregation is bit-exact " +
        "across engines regardless of their frame-evaluation algorithm.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val cents = round($"value" * 100).cast("long")
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
          .rowsBetween(-4, 0)
        Tables.events(s, d)
          .select($"event_id", $"user_id",
            sum(cents).over(w).as("rolling_cents"),
            count(lit(1)).over(w).as("n_window"))
          // Digest (r8): sum(event_id × rolling_cents) pins every row's
          // frame result to ITS row — a frame shifted by one row changes
          // the weighted sum even when the plain sum survives.
          .groupBy(($"user_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"rolling_cents").cast("long").as("sum_cents"),
            sum($"n_window").cast("long").as("sum_nw"),
            sum($"event_id" * $"rolling_cents").cast("long")
              .as("sig_frame"))
          .orderBy($"bucket")
      },
      Some("""WITH w AS (
             |  SELECT event_id, user_id,
             |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w
             |      AS BIGINT) AS rolling_cents,
             |    CAST(COUNT(*) OVER w AS BIGINT) AS n_window
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts) // 1000, event_id
             |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(rolling_cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(n_window) AS BIGINT) AS sum_nw,
             |  CAST(sum(event_id * rolling_cents) AS BIGINT) AS sig_frame
             |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("d_dup_clusters",
      "Dedup post-pass: duplicate clusters = connected components over " +
        "near-dup candidate edges (token-set Jaccard ≥ 0.3 within source " +
        "groups), cluster id = min doc id. Spark: alternating large-star/" +
        "small-star rounds (O(log n)); oracle: DuckDB recursive CTE — " +
        "independent " +
        "algorithms, identical components.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter($"doc_id" < 100)
          .select($"doc_id", $"source",
            array_distinct(split($"text", " ")).as("toks"))
        val a = docs.as("a"); val b = docs.as("b")
        // integer cross-multiplication, not a float ratio — exact compare
        val edges = a.join(b, col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
          .filter(lit(10) * size(array_intersect(col("a.toks"),
            col("b.toks"))) >=
            lit(3) * size(array_union(col("a.toks"), col("b.toks"))))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        Dedup.duplicateClusters(docs.select($"doc_id"), edges, "doc_id")
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT doc_id, source,
             |    list_distinct(string_split(text, ' ')) AS toks
             |  FROM documents WHERE doc_id < 100),
             |e AS (SELECT a.doc_id AS a, b.doc_id AS b
             |  FROM t a JOIN t b
             |  ON a.source = b.source AND a.doc_id < b.doc_id
             |  AND 10 * len(list_intersect(a.toks, b.toks)) >=
             |      3 * len(list_distinct(list_concat(a.toks, b.toks)))),
             |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS lab FROM t
             |  UNION
             |  SELECT ee.b, reach.lab FROM reach
             |  JOIN ee ON ee.a = reach.id)
             |SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    Q("stream_dedup",
      "Streaming dedup: dropDuplicatesWithinWatermark on (user_id, " +
        "event_type) over the file stream, run to completion (single " +
        "batch over the static table ⇒ exactly batch DISTINCT), then " +
        "distinct-users-per-type — oracle-checked against batch SQL.",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemoryAppend(s,
            s"stream_dedup_${System.nanoTime()}") { scoped =>
            // single batch (MaxValue trigger) — across batches the watermark
            // advance could drop rows that batch DISTINCT keeps
            val stream = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            Streams.streamingDedup(stream, "ts",
              Seq("user_id", "event_type"), "1 hour")
          }
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_first_seen"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS n_first_seen
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("stream_windowed_counts",
      "Streaming: file-source stream → watermarked tumbling-window " +
        "counts, run to completion on the static events table; equals the " +
        "batch truncation aggregate (oracle-checked).",
      (s, d) => {
        import s.implicits._
        // raw (as-stored) schema — the stream reads the file directly; the
        // glob keeps basePath a directory as the file source requires
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemory(s,
            s"stream_counts_${System.nanoTime()}") { scoped =>
            val stream = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            Streams.windowedCounts(stream, "ts", "1 hour", "1 hour")
          }
          .select(col("window.start").cast("timestamp").as("window_start"),
            col("event_type"), col("n"),
            round(col("total_value"), 2).as("total_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP)
             |    AS window_start,
             |  event_type, count(*) AS n,
             |  round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin))
  )
}
