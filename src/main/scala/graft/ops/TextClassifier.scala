package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned quality-classifier INFERENCE — the fastText-style linear
  * scorer every production curation pipeline pairs with its rule-based
  * filters (CCNet uses a fastText LM filter, RefinedWeb and Gopher §A1
  * pair rules with a trained quality classifier; the reference's own
  * coverage notes name this as the one remaining stand-in).
  *
  * Model shape (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"): a document is a bag of hashed token n-gram
  * features; the score is a linear function of the feature counts,
  * `logit = (Σ_f count_f · w[h(f)]) / n_feats`, thresholded for the
  * keep/drop decision. Inference — the part that must run over 100 TB —
  * is exactly: tokenize → hash features into [0, dim) → broadcast-join
  * the dim-row weight table → one per-doc sum. No shuffle except the
  * final doc-keyed aggregation (map-side combined), no UDF anywhere:
  * tokenization is `split`, feature hashing is the engine's md5-prefix
  * idiom, the dot product is a broadcast hash join + `sum`.
  *
  * Exactness discipline: weights are FIXED-POINT integers (trained
  * float weights quantize to integer millis at export time — standard
  * fastText quantization), so `dot` is an exact BIGINT; the keep
  * decision `logit >= thrNum/thrDen` is the cross-multiplied integer
  * comparison `thrDen·dot >= thrNum·n_feats` — no float division
  * decides anything. The reported `score` is the single IEEE division
  * dot/n_feats on exactly-representable operands (both < 2^53), which
  * both engines evaluate to the same bits.
  *
  * Scale: the weight table is dim rows (2^20 for a production model) —
  * always broadcastable; the feature stream is ~2 rows per token and
  * never materializes per-doc vectors; the only exchange is the final
  * groupBy(doc) partial-agg. A billion-doc corpus scores in one pass.
  */
object TextClassifier {

  /** Hashed feature id in [0, dim): low 60 bits of md5, mod dim —
    * the engine's established cross-engine hash (15 hex chars stay
    * under 2^63; non-negative, so `%` ≡ pmod on both engines).
    * Power-of-two dims use the bit-identical `& (dim-1)` instead of
    * `%` (r19): Remainder is ALWAYS nullable in Spark (x % 0 → NULL),
    * so a join key built with `%` makes every join infer an
    * `isnotnull(md5_prefix64(...) % dim)` filter that re-runs the
    * hash kernel per feature row below the fid projection (guide
    * §4.4's duplicated-evaluation class; r19 plan audit). BitwiseAnd
    * inherits the child's nullability, so with a non-null feat the
    * fid is non-nullable and no filter is inferred. For non-negative
    * x and power-of-two d, x % d ≡ x & (d−1) exactly. */
  def featureHash(feat: Column, dim: Int): Column = {
    val h = graft.functions.text.md5_prefix64(feat, 15)
    if (dim > 0 && (dim & (dim - 1)) == 0)
      h.bitwiseAND(lit(dim.toLong - 1L))
    else h % dim.toLong
  }

  /** Spread an under-split batch scan before an expensive per-row
    * stage (tokenize + n-gram explode: ~10³ generated rows and two
    * md5s per token of work per input row). A small corpus arrives
    * as one parquet file = ONE scan partition, and everything up to
    * the first exchange then runs single-task (r18 measured: the
    * fused gate chain's 1.9 s stage was this). When the scan is
    * already at session width (any at-scale corpus), this is a
    * no-op — the repartition only fires for under-split inputs, so
    * no full-corpus shuffle is ever added at 100 TB. Streaming
    * frames pass through untouched (micro-batches own their
    * parallelism; the inline zero-state forms are the streaming
    * path anyway). */
  private[graft] def spread(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    // Only scan-rooted NARROW chains can be under-split — a frame
    // with any exchange-introducing operator upstream (join, agg,
    // window, distinct, repartition, global sort/limit, set op)
    // already runs at session width, and probing ITS partition count
    // via df.rdd would eagerly execute those upstream stages under
    // AQE just to read a number (r18 self-review). For a narrow
    // chain .rdd only plans — there are no stages to execute. The
    // check WHITELISTS known-narrow operators (r19, from r18 advice:
    // a blacklist missed Sort/GlobalLimit/set-ops and would let a
    // future orderBy-rooted caller trip the eager-execution hazard).
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.collectFirst {
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[Filter] ||
        p.isInstanceOf[Generate] || p.isInstanceOf[SubqueryAlias] ||
        p.isInstanceOf[LocalLimit] || p.isInstanceOf[LeafNode]) => p
    }.isDefined
    if (wide) return df
    // Width is DATA-SCALED (r19, guide §2.2): the per-row stage this
    // spreads (tokenize + n-gram explode + 2 md5s/token) costs
    // ~7 µs per input byte, so 8 KB/task ≈ 50 ms of hash work per
    // task — enough to amortize task overhead while keeping the
    // benched-SF shape identical to the r18 session-width form that
    // measured the 1.37-1.45× embed/terciles wins (255 KB of docs at
    // sf0.1 saturates 32). Tiny corpora (the correctness SFs, 28 KB)
    // now get ~4 tasks instead of a full-width exchange; at-scale
    // inputs saturate the session conf, so the 100 TB shape is
    // unchanged.
    val width = Width.scaled(df, 8L << 10)
    if (width <= 1 || df.rdd.getNumPartitions >= width) df
    else df.repartition(width, key)
  }

  /** The same hash as DuckDB SQL over a feature expression. */
  def featureHashSql(featExpr: String, dim: Int): String =
    s"CAST(concat('0x', substr(md5($featExpr), 1, 15)) AS BIGINT) % $dim"

  /** Opt-in cure for the \x0B corpus invariant documented on
    * [[ngramFeatures]]: Java regex `\s` matches vertical tab \x0B
    * while DuckDB/RE2's does not, so a corpus carrying \x0B
    * tokenizes differently on the two engines. ONE character
    * translation mapping \x0B → ' ' BEFORE tokenization puts both
    * engines on the same whitespace alphabet (no regex — `translate`
    * is an exact char map, codegen'd, shuffle-free); apply
    * [[normalizeVtSql]] to the oracle side of the same query. The
    * test corpus carries no \x0B, so this stays opt-in rather than
    * a cost every clean corpus pays. */
  def normalizeVt(text: Column): Column =
    translate(text, "\u000B", " ")

  /** [[normalizeVt]] as DuckDB SQL (exact literal replace). */
  def normalizeVtSql(textExpr: String): String =
    s"replace($textExpr, chr(11), ' ')"

  /** Deterministic stand-in weight table (fid, wgt) with
    * wgt = h("w:"||fid) % 2001 − 1000 ∈ [−1000, 1000] fixed-point
    * millis — the oracle-replayable stand-in for a TRAINED model's
    * exported weights. In production the weights frame is
    * `spark.read.parquet(modelDir)` (fastText export quantized to
    * integer millis); inference below is identical either way — the
    * stand-in exists so the driver's DuckDB oracle can rebuild the
    * exact same model without shipping a binary. */
  def standInWeights(s: SparkSession, dim: Int): DataFrame =
    s.range(0, dim.toLong).select(col("id").as("fid"),
      (featureHash(concat(lit("w:"), col("id").cast("string")), 2001)
        - 1000L).as("wgt"))

  /** The stand-in weight table as DuckDB SQL (CTE body). */
  def standInWeightsSql(dim: Int): String =
    s"""SELECT fid, ${featureHashSql("'w:' || CAST(fid AS VARCHAR)", 2001)}
       | - 1000 AS wgt
       |FROM (SELECT unnest(range(0, $dim)) AS fid)""".stripMargin

  /** The uni+bigram feature-array SQL over a tokens array named
    * `__toks` — ONE definition shared by [[ngramFeatures]] (the batch
    * explode path) and [[scoreDocsInline]] (the zero-state map path),
    * whose row-for-row equality is spec-pinned; a feature-stream fix
    * applied to one site cannot desynchronize the other. */
  private[graft] val featsExpr =
    "concat(__toks, CASE WHEN size(__toks) < 2 THEN array() " +
      "ELSE transform(sequence(1, size(__toks) - 1), " +
      "i -> concat(__toks[i - 1], ' ', __toks[i])) END)"

  /** Per-doc unigram + adjacent-bigram feature stream (id, feat) —
    * whitespace tokens plus space-joined adjacent pairs (tokens never
    * contain whitespace, so the two families cannot collide). Built
    * from the token ARRAY with `transform` — narrow, no per-doc
    * window sort; the size()<2 guard exists because Spark's
    * `sequence(1, 0)` is a DESCENDING sequence, not empty.
    *
    * Corpus invariant (shared with every `split(trim(text), "\\s+")`
    * site since r14): Java regex `\s` matches vertical tab \x0B while
    * DuckDB/RE2's does not, so a document containing \x0B would
    * tokenize differently on the two engines. The test corpus has
    * none; a corpus that may carry \x0B must normalize it to ' '
    * (one regexp_replace on both sides) before classification. */
  def ngramFeatures(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val toks = spread(docs, col(idCol)).select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__toks"))
    // feat is PROVABLY never NULL (split elements are non-null
    // strings; concat of non-nulls is non-null) but the explode
    // output is typed nullable (array containsNull), so every join
    // on featureHash(feat) used to infer an
    // `isnotnull(md5_prefix64(feat) % dim)` filter below the fid
    // projection — re-running the hash kernel on EVERY feature row
    // (r19 plan audit: two md5_prefix64(feat) sites in every
    // classifier/embed plan; guide §4.4's duplicated-evaluation
    // class). coalesce to '' is value-identical and makes the column
    // non-nullable, so no null filter is inferred and the hash runs
    // once.
    toks.select(col(idCol), explode(expr(featsExpr)).as("__feat"))
      .select(col(idCol), coalesce(col("__feat"), lit("")).as("feat"))
  }

  /** [[scoreDocs]] as a PURE PER-ROW MAP — no explode, no join, no
    * aggregation: the weight table ships as a literal map (dim
    * entries — metadata-sized, the model-as-artifact pattern), the
    * feature stream stays inside one array expression, and the dot
    * product is `aggregate` over the hashed ids. Identical output to
    * [[scoreDocs]] row for row (spec-pinned); this is the STREAMING
    * serving shape — per-doc classification with ZERO state, so a
    * classifier stage adds no stateful operator to a streaming
    * pipeline and no exchange to a batch one. Prefer [[scoreDocs]]
    * when the weight table is a DataFrame you'd rather broadcast
    * than inline (both are the same model). */
  def scoreDocsInline(docs: DataFrame, idCol: String, textCol: String,
                      weights: Map[Long, Long], dim: Int,
                      thrNum: Long, thrDen: Long): DataFrame = {
    require(thrDen > 0, s"thrDen must be positive, got $thrDen")
    require(weights.size == dim && (0 until dim).forall(i =>
      weights.contains(i.toLong)),
      s"weights must cover every fid in [0, $dim)")
    // literal ARRAY indexed by fid, not a literal map: element_at on
    // a literal map is a LINEAR scan of all dim entries per lookup
    // (measured ~2 s/micro-batch at dim=1024 in the streaming gate);
    // fids are dense in [0, dim) by construction (the require above),
    // so an array lookup is the same total function as O(1)
    val wmap = typedLit((0 until dim).map(i => weights(i.toLong)))
    // NULL text: scoreDocs' explode(NULL array) DROPS the doc (and so
    // does the oracle's unnest(range(0, len(NULL)))) — the map path
    // must drop it too, or it alone would emit an all-NULL row and
    // break the spec-pinned row-for-row equality
    docs
      .filter(col(textCol).isNotNull)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__fids", transform(expr(featsExpr),
        f => featureHash(f, dim)))
      .select(col(idCol),
        size(col("__fids")).cast("long").as("n_feats"),
        aggregate(col("__fids"), lit(0L),
          (acc, fid) => acc +
            element_at(wmap, (fid + 1L).cast("int"))).as("dot"))
      .select(col(idCol), col("n_feats"), col("dot"),
        (col("dot").cast("double") / col("n_feats").cast("double"))
          .as("score"),
        (lit(thrDen) * col("dot") >= lit(thrNum) * col("n_feats"))
          .as("keep"))
  }

  /** Score every document: (id, n_feats, dot, score, keep) where
    * dot = Σ w[h(feature)] over the doc's unigram+bigram stream,
    * score = dot/n_feats (one IEEE step), and
    * keep ⟺ thrDen·dot ≥ thrNum·n_feats (exact integers; n_feats ≥ 1
    * always — split of an empty string yields one empty token).
    * `weights` must be EXACTLY one (fid, wgt) row per fid in
    * [0, dim) — enforced by [[requireFullCoverage]] at construction
    * (one Spark action on the metadata-sized model frame, the
    * model-load cost): the inner join below would otherwise SILENTLY
    * drop uncovered features from both n_feats and dot (sparse
    * export) or double-count features (duplicated fid row), while
    * [[scoreDocsInline]] rejects bad maps loudly — all paths now
    * enforce the same precondition (zero-pad a sparse export at
    * write time, exactly as fastText quantization does). */
  /** One-action full-coverage guard for a (fid, wgt) model frame:
    * EXACTLY dim rows and EXACTLY dim distinct in-range fids — a
    * sparse export (missing fids would silently drop features from
    * n_feats AND dot through the inner join) and a duplicated-fid
    * export (a repeated row would silently double-count every
    * feature hashing to it) both fail loudly at construction.
    * Shared by [[scoreDocs]] and TextStats.curationStats so the
    * batch, fused, and inline paths enforce the same precondition. */
  private[graft] def requireFullCoverage(weights: DataFrame,
                                         dim: Int): Unit = {
    val row = weights.agg(count(lit(1)).as("n"),
      count_distinct(when(col("fid") >= 0L &&
        col("fid") < dim.toLong, col("fid"))).as("nd")).head()
    val (n, nd) = (row.getLong(0), row.getLong(1))
    require(n == dim.toLong && nd == dim.toLong,
      s"weights must be EXACTLY one row per fid in [0, $dim): got " +
        s"$n rows, $nd distinct in-range fids — zero-pad sparse " +
        "model exports, dedup repeated fids")
  }

  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                weights: DataFrame, dim: Int,
                thrNum: Long, thrDen: Long): DataFrame = {
    require(thrDen > 0, s"thrDen must be positive, got $thrDen")
    requireFullCoverage(weights, dim)
    val feats = ngramFeatures(docs, idCol, textCol)
      .select(col(idCol), featureHash(col("feat"), dim).as("fid"))
    feats.join(broadcast(weights), Seq("fid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("wgt")).as("dot"))
      .select(col(idCol), col("n_feats"), col("dot"),
        (col("dot").cast("double") / col("n_feats").cast("double"))
          .as("score"),
        (lit(thrDen) * col("dot") >= lit(thrNum) * col("n_feats"))
          .as("keep"))
  }
}
