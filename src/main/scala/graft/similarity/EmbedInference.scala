package graft.similarity

import graft.ops.TextClassifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned EMBEDDING inference — the hashed-projection encoder that
  * turns a document into a dense vector, as fixed-point integer
  * arithmetic (the TextClassifier playbook applied to the engine's
  * last modeled stand-in; hashed projections are the classic
  * hashing-trick feature map of Weinberger et al. 2009, and a
  * quantized linear projection over hashed n-gram counts is exactly
  * the fastText sentence-vector shape of Joulin et al. 2016 §2).
  *
  * Model: e_j(doc) = Σ_f count_f · W[h(f), j] for j in [0, outDim) —
  * a dim×outDim weight matrix applied to hashed unigram+bigram
  * counts. Weights are fixed-point integer millis (a trained float
  * export quantizes at write time), so every e_j is an exact BIGINT
  * and any engine replays it bit-for-bit; similarity over these
  * vectors (dot products) is exact integer arithmetic too.
  *
  * Inference plan — the shape that runs over 100 TB: tokenize →
  * explode the uni+bigram stream (TextClassifier.ngramFeatures, ONE
  * shared definition with the classifier) → hash → broadcast-join
  * the (fid, j, wgt) weight table (dim·outDim rows — metadata-sized
  * at any corpus size) → ONE (id, j)-keyed aggregation, map-side
  * combined. No per-doc vector materializes until the caller asks
  * for one ([[embedVectors]]).
  */
object EmbedInference {

  /** Deterministic stand-in projection matrix (fid, j, wgt) with
    * wgt = h("e:"‖fid‖":"‖j) % 2001 − 1000 ∈ [−1000, 1000] integer
    * millis — the oracle-replayable stand-in for a TRAINED encoder's
    * quantized export. In production this frame is
    * `spark.read.parquet(modelDir)`; inference is identical. */
  def standInProjection(s: SparkSession, dim: Int,
                        outDim: Int): DataFrame =
    s.range(0, dim.toLong * outDim).select(
      (col("id") / outDim).cast("long").as("fid"),
      (col("id") % outDim).cast("long").as("j"),
      (TextClassifier.featureHash(
        concat(lit("e:"), (col("id") / outDim).cast("long")
          .cast("string"), lit(":"),
          (col("id") % outDim).cast("long").cast("string")), 2001)
        - 1000L).as("wgt"))

  /** The stand-in projection as DuckDB SQL (CTE body). */
  def standInProjectionSql(dim: Int, outDim: Int): String =
    s"""SELECT u // $outDim AS fid, u % $outDim AS j,
       |  ${TextClassifier.featureHashSql(
          s"'e:' || CAST(u // $outDim AS VARCHAR) || ':' || " +
            s"CAST(u % $outDim AS VARCHAR)", 2001)} - 1000 AS wgt
       |FROM (SELECT unnest(range(0, ${dim.toLong * outDim})) AS u)"""
      .stripMargin

  /** Embed every document: (id, j, e) rows with
    * e = Σ_features wgt[h(feat), j] — exact BIGINT per dimension.
    * `weights` must be (fid, j, wgt) covering [0, dim) × [0, outDim)
    * (dim·outDim rows — the model artifact). Plan shape: the weight
    * matrix is PIVOTED to one dim-row frame with outDim columns at
    * construction (metadata-sized), so the feature stream joins it
    * WITHOUT fanning out ×outDim — the naive (fid, j, wgt) row join
    * materializes features×outDim rows in the join stage where this
    * shape keeps outDim accumulators inside ONE per-doc hash-agg
    * codegen stage and the exchange carries |docs| partial rows.
    * (Locally the two MEASURE equal at sf0.1 — ~3.7 s warm either
    * way, tokenize+explode dominates — the pivot is kept for the
    * ×outDim row-materialization it removes at corpus scale, where
    * the join stage's row width × count is the memory-bandwidth
    * term.) The (id, j, e) long form is restored by one posexplode
    * over the |docs|-row result.
    * NULL-text docs vanish (explode of a NULL token array), the
    * engine-wide scorer convention. Integer sums are associative and
    * commutative, so regrouping the additions is value-identical to
    * the per-(id, j) sum the oracle replays. */
  def embedDocs(docs: DataFrame, idCol: String, textCol: String,
                weights: DataFrame, dim: Int, outDim: Int): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    // same loud-failure posture as TextClassifier.requireFullCoverage
    // (one action on the metadata-sized model frame): a sparse
    // export would silently drop the feature from EVERY dimension
    // through the inner join, a partially-sparse one would zero some
    // dims only (NULL pivot cells vanish from sums), and a
    // duplicated (fid, j) row would double-count — all with no error
    val row = weights.agg(count(lit(1)).as("n"),
      count_distinct(when(col("fid") >= 0L &&
          col("fid") < dim.toLong &&
          col("j") >= 0L && col("j") < outDim.toLong,
        struct(col("fid"), col("j")))).as("nd")).head()
    val want = dim.toLong * outDim
    require(row.getLong(0) == want && row.getLong(1) == want,
      s"weights must be EXACTLY one row per (fid, j) in [0, $dim) x " +
        s"[0, $outDim): got ${row.getLong(0)} rows, " +
        s"${row.getLong(1)} distinct in-range pairs — zero-pad " +
        "sparse model exports, dedup repeated cells")
    val js = 0 until outDim
    val wide = weights.groupBy(col("fid"))
      .agg(max(when(col("j") === 0, col("wgt"))).as("w0"),
        js.tail.map(j =>
          max(when(col("j") === j, col("wgt"))).as(s"w$j")): _*)
    val feats = TextClassifier.ngramFeatures(docs, idCol, textCol)
      .select(col(idCol), TextClassifier.featureHash(col("feat"), dim)
        .as("fid"))
    val sums = feats.join(broadcast(wide), Seq("fid"))
      .groupBy(col(idCol))
      .agg(sum(col("w0")).as("e0"),
        js.tail.map(j => sum(col(s"w$j")).as(s"e$j")): _*)
    sums.select(col(idCol), posexplode(
        array(js.map(j => col(s"e$j")): _*)).as(Seq("j", "e")))
      .select(col(idCol), col("j").cast("long").as("j"), col("e"))
  }

  /** The whole inference chain as DuckDB CTE bodies — `toks`,
    * `feats`, `w`, `emb` (the last MATERIALIZED: every consumer
    * references it more than once and DuckDB re-inlines shared CTEs
    * exponentially otherwise) — verbatim the chain the r17
    * `m_embed_infer` / `e_knn_embed_infer` oracles carry inline, ONE
    * definition for every composition that serves these embeddings
    * (IVF tier, recall eval, on-disk-model replays). Splice after
    * `WITH `; `emb` is (doc_id, j, e) with e an exact BIGINT. */
  def embedChainSql(dim: Int, outDim: Int): String =
    s"""toks AS (
       |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
       |  FROM (SELECT doc_id,
       |          string_split_regex(trim(text), '\\s+') AS toks
       |        FROM documents) t,
       |    unnest(range(0, len(toks))) AS u(p)),
       |feats AS (
       |  SELECT doc_id, tok AS feat FROM toks
       |  UNION ALL
       |  SELECT doc_id, feat FROM (
       |    SELECT doc_id, tok || ' ' || lead(tok) OVER
       |        (PARTITION BY doc_id ORDER BY p) AS feat
       |    FROM toks) b
       |  WHERE feat IS NOT NULL),
       |w AS (${standInProjectionSql(dim, outDim)}),
       |emb AS MATERIALIZED (
       |  SELECT doc_id, j, CAST(sum(wgt) AS BIGINT) AS e
       |  FROM (SELECT doc_id,
       |      ${TextClassifier.featureHashSql("feat", dim)} AS fid
       |    FROM feats) h
       |  JOIN w USING (fid)
       |  GROUP BY doc_id, j)""".stripMargin

  /** [[embedDocs]] rows assembled into one dense vector per doc:
    * (id, emb array<float>) in j order, for the cosine/MIPS ANN
    * tier (Knn.*). The float cast is value-preserving only while
    * |e| < 2^24 — NOT guaranteed by the model shape (a legal
    * 100k-word doc has ~200k feature occurrences of weights up to
    * 1000 in magnitude), so the cast is GUARDED in-plan: any
    * component at or past 2^24 raises instead of silently rounding
    * (a rounded vector would quietly change downstream dedup/ANN
    * decisions away from the exact-BIGINT rows). The bound is
    * DELIBERATELY conservative by one value: ±2^24 itself is still
    * exactly float-representable (the first unrepresentable integer
    * is 2^24+1), but `>=` keeps the accepted domain strictly inside
    * the exact range rather than ending exactly on its edge.
    * Callers with larger domains keep the exact (id, j, e) long
    * form or rescale the model weights. */
  def embedVectors(embedRows: DataFrame, idCol: String): DataFrame =
    embedRows.groupBy(col(idCol))
      .agg(expr("transform(array_sort(collect_list(" +
        "struct(j, e))), x -> CASE WHEN abs(x.e) >= 16777216 THEN " +
        "CAST(raise_error(concat('embedVectors: |e| >= 2^24 at j=', " +
        "CAST(x.j AS STRING), ' — the float cast would round; use " +
        "the exact (id, j, e) rows or rescale the model')) AS FLOAT) " +
        "ELSE CAST(x.e AS FLOAT) END)").as("embedding"))
}
