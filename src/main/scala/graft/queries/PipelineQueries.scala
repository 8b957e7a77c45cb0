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
  * over the `documents` and `embeddings` harness tables. Queries that rely
  * on engine-specific hash functions (xxhash64) or non-SQL semantics have
  * no DuckDB oracle and get the driver's rows-only check; everything
  * count/length-based is oracle-checked exactly (integer outputs, no float
  * compare).
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
        "only argmax over marker-word hits). Not SQL-expressible → " +
        "rows-only check; accuracy asserted in ScalaTest.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"lang",
            TextOps.langId($"text").as("pred_lang"))
          .orderBy($"doc_id")
      },
      None),

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
        "join; per-doc candidate counts (xxhash64-based → rows-only).",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2)
        val perDoc = cands.select($"a_id".as("doc_id"))
          .union(cands.select($"b_id".as("doc_id")))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_candidates"))
        docs.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_candidates"))
          .orderBy($"doc_id")
      },
      None),

    Q("d_simhash",
      "Dedup: 64-bit SimHash signatures (per-bit majority over token " +
        "hashes, expression-only) — rows-only (engine hash).",
      (s, d) => {
        import s.implicits._
        Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      None),

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
      None),

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
      Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings
             |           WHERE vec_id < 10),
             |pairs AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(q.embedding, e.embedding) AS sim
             |  FROM q CROSS JOIN embeddings e
             |  WHERE e.vec_id <> q.vec_id)
             |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
             |FROM (SELECT query_id, neighbor_id,
             |        ROW_NUMBER() OVER (PARTITION BY query_id
             |          ORDER BY sim DESC, neighbor_id) AS rn
             |      FROM pairs) t
             |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("e_knn_lsh",
      "Similarity: LSH-bucketed ANN top-k — the scale path (probe one " +
        "bucket instead of the corpus). Engine hash planes → rows-only; " +
        "recall vs brute force asserted in ScalaTest.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Knn.lshTopK(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", k = 5, nPlanes = 4)
          .select($"query_id", $"neighbor_id", $"rank".cast("long")
            .as("rank"))
          .orderBy($"query_id", $"rank")
      },
      None),

    Q("e_knn_ivf",
      "Similarity: IVF-style ANN — data-adaptive centroid cells, nProbe " +
        "nearest cells probed per query (deterministic centroid sample → " +
        "rows-only; recall vs brute force asserted in ScalaTest).",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Knn.ivfTopK(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", k = 5, nCells = 16, nProbe = 3)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      None),

    Q("m_multimodal_meta",
      "Multimodal: binary-column plumbing — payload bytes + typed " +
        "metadata; byte length oracle-checked, stub decode exercised in " +
        "ScalaTest.",
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
          .withColumn("n_tokens", TextOps.tokenCount($"text"))
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

    Q("stream_windowed_counts",
      "Streaming: file-source stream → watermarked tumbling-window " +
        "counts, run to completion on the static events table; equals the " +
        "batch truncation aggregate (oracle-checked).",
      (s, d) => {
        import s.implicits._
        // raw (as-stored) schema — the stream reads the file directly; the
        // glob keeps basePath a directory as the file source requires
        val schema = Tables.eventsRaw(s, d).schema
        val stream = Tables.normalizeEventsTs(
          Streams.fileStream(s, s"$d/events.*", schema))
        val agg = Streams.windowedCounts(stream, "ts", "1 hour", "1 hour")
        Streams.runToMemory(agg, s"stream_counts_${System.nanoTime()}")
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
