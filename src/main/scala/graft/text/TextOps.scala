package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, and document fingerprinting.
  * Everything here is built from codegen'd `functions._` expressions — no
  * Scala UDF in the hot path — so whole-stage codegen spans the full
  * pipeline and the operators run at parquet-scan speed on 100 TB.
  */
object TextOps {

  /** Whitespace token count. `split` on \s+ with empty-string guard (Spark's
    * split of "" yields [""], so blank docs count 0 tokens).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** A BPE-ish token estimate: words + punctuation runs counted separately,
    * approximating subword tokenizer behavior without a vocab file.
    */
  def tokenCountBpeIsh(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L)).otherwise(
      size(split(trim(text), "\\s+")).cast("long") +
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
          .cast("long"))

  /** Quality-score feature columns: char count, token count, mean word
    * length, punctuation ratio, distinct-stopword count, alpha ratio. All
    * plain column arithmetic — one projection, zero shuffles.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nStop = size(array_intersect(
      split(lower(t), "\\s+"), lit(stopwords.toArray))).cast("long")
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", nTok)
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, "\\s+", "")).cast("double") /
          greatest(nTok, lit(1L)), 2))
      .withColumn("punct_ratio",
        round((length(t) - length(regexp_replace(t, "[\\p{Punct}]", "")))
          .cast("double") / greatest(length(t), lit(1)), 4))
      .withColumn("alpha_ratio",
        round(length(regexp_replace(t, "[^A-Za-z]", ""))
          .cast("double") / greatest(length(t), lit(1)), 4))
      .withColumn("stop_distinct", nStop)
  }

  /** Language ID via stopword-hit heuristic: score each candidate language
    * by how many of its marker words appear in the document, pick argmax.
    * Pure expression code — `array_intersect` against small literal arrays,
    * `greatest`-based argmax — broadcastable to any scale.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(size(array_intersect(toks, lit(ms.toArray))).as("score"),
             lit(lang).as("lang"))
    }
    // argmax by (score, lang): greatest on structs compares fieldwise
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Document fingerprint: a 64-bit rolling-style hash of the normalized
    * text (collapsed whitespace, lowercased) — xxhash64 is Spark's codegen'd
    * 64-bit hash, the idiomatic stand-in for a hand-rolled polynomial hash.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Character n-gram shingles of the normalized text, as a distinct array —
    * the input to MinHash/Jaccard dedup. Expression-only (`sequence` +
    * `transform` + `substr`), so it stays inside codegen.
    */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(
      transform(sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
        i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles: join every n consecutive tokens. Expression-only
    * (`sequence` + `transform` + `slice` + `array_join`) — fine for small
    * frames and ad-hoc use, but the `transform` lambda references the outer
    * token array, which interpreted HOF evaluation re-inlines per element
    * (O(tokens²) per doc). Hot paths should use the single-pass typed
    * variant (`graft.dedup.Dedup.shingleSets`) instead.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Context-window chunking: split each document into overlapping windows
    * of `window` tokens advancing by `stride` — the standard prep step
    * before feeding a bounded-context model. One typed pass (tokenize once
    * per doc, emit slices): a higher-order `transform` over an outer
    * column re-inlines the tokenization per chunk in interpreted mode (the
    * round-1 ~1000× pitfall), so chunking flatMaps instead. Empty docs
    * produce no chunks; every non-empty doc produces ≥ 1.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text.trim
        if (t.isEmpty) Iterator.empty
        else {
          val toks = t.split("\\s+")
          val nChunks = (toks.length - 1) / stride + 1
          Iterator.range(0, nChunks).map { i =>
            (id, i.toLong,
              toks.slice(i * stride, i * stride + window).mkString(" "))
          }
        }
      }
      .toDF(idCol, "chunk_idx", "chunk")
  }

  /** URL canonicalization (the CCNet/RefinedWeb URL-dedup key), as one
    * codegen'd Column expression — pure `functions._` string work, no
    * UDF, so the whole rule set stays inside WholeStageCodegen:
    *  - scheme and host lowercased (path case preserved);
    *  - default port stripped (`https:443`, `http:80`);
    *  - duplicate path slashes collapsed, trailing slash dropped
    *    (empty path → "/");
    *  - tracking params removed (`utm_*`, `fbclid=`, `gclid=`),
    *    surviving query params SORTED; empty query → no "?";
    *  - fragment stripped.
    * IDEMPOTENT: applying it to its own output is a no-op (spec-pinned)
    * — the property that makes it safe as a dedup KEY derivation at any
    * pipeline stage, whether the input was raw or already canonical.
    */
  def canonicalizeUrl(url: Column): Column = {
    def sp(c: Column, delim: String, n: Int) =
      split_part(c, lit(delim), lit(n))
    val nofrag = regexp_replace(url, "#.*$", "")
    val base = sp(nofrag, "?", 1)
    val query = sp(nofrag, "?", 2)
    val scheme = lower(sp(base, "://", 1))
    val rest = sp(base, "://", 2)
    val hostport = sp(rest, "/", 1)
    val path = rest.substr(length(hostport) + 1, lit(1000000))
    val host = lower(sp(hostport, ":", 1))
    val port = sp(hostport, ":", 2)
    val cleanPath =
      regexp_replace(regexp_replace(path, "/{2,}", "/"), "/$", "")
    val keptQ = array_join(array_sort(filter(split(query, "&"),
      p => !(startswith(p, lit("utm_")) ||
        startswith(p, lit("fbclid=")) ||
        startswith(p, lit("gclid="))))), "&")
    concat(
      scheme, lit("://"), host,
      when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), "")
        .otherwise(concat(lit(":"), port)),
      when(cleanPath === "", "/").otherwise(cleanPath),
      when(keptQ === "", "").otherwise(concat(lit("?"), keptQ)))
  }
}
