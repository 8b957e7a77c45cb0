package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB path:
  *
  *  - exact:    one hash-groupBy — a single shuffle on a 64/128-bit digest,
  *              never on the full text.
  *  - MinHash:  shingle → k minhashes → band → bucket-join. Signatures are
  *              computed in ONE typed mapPartitions pass (tokenize once per
  *              doc, k minima in one sweep) — Spark's higher-order array
  *              expressions are interpreted (not codegen'd) and re-inline
  *              the tokenization per element, which profiled ~1000× slower.
  *              The candidate join shuffles only (doc_id, band, hash64)
  *              rows; the quadratic part runs inside buckets only.
  *  - SimHash:  64-bit signature, same single-pass pattern; near-dup =
  *              equal 16-bit band (pigeonhole over Hamming distance).
  *  - n-gram Jaccard: exact verify applied after LSH candidate generation.
  *  - embedding cosine: near-dup over an embedding column via normalized
  *              dot product, bucketed with random-hyperplane LSH.
  */
object Dedup {

  /** Exact dedup: group on a content digest, keep the smallest id per
    * group. Shuffles 16-byte digests + ids only.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup over NFC-NORMALIZED text: same digest groupBy, but the
    * key is `unicode_normalize(text, 'NFC')` (the codegen'd
    * [[graft.functions.UnicodeNormalize]]), so the precomposed and
    * combining-sequence spellings of the same visible text land in ONE
    * group — the false-negative a byte-level hash key leaves open on web
    * text. Cost over [[exact]] is ~a strlen per row: the normalizer's
    * all-ASCII fast path returns the input buffer untouched, so only
    * rows that actually carry non-ASCII pay the normalize.
    */
  def exactNormalized(df: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    df.groupBy(md5(graft.functions.text
        .unicode_normalize(col(textCol), "NFC")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic 64-bit string hash with seed (two murmur32 halves). */
  private[dedup] def h64(s: String, seed: Int): Long = {
    val h1 = MurmurHash3.stringHash(s, seed)
    val h2 = MurmurHash3.stringHash(s, seed ^ 0x9e3779b9)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  private[dedup] def tokenize(text: String): Array[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** MinHash signatures: one pass per document — tokenize once, slide an
    * n-token window, update all k minima per shingle. Output
    * (id: long, sig: array<long>[k]).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, shingleN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sig = Array.fill(k)(Long.MaxValue)
          val toks = tokenize(text)
          val shingles =
            if (toks.length <= shingleN) Iterator(toks.mkString(" "))
            else toks.sliding(shingleN).map(_.mkString(" "))
          // standard 2-hash scheme: hash each shingle twice, derive the k
          // "permutations" as h1 + i*h2 — O(2) string hashes per shingle
          // instead of O(k), the dominant CPU cost at corpus scale
          shingles.foreach { sh =>
            val h1 = h64(sh, 0)
            val h2 = h64(sh, 1) | 1L // odd => full-period stride
            var i = 0
            var h = h1
            while (i < k) {
              if (h < sig(i)) sig(i) = h
              h += h2
              i += 1
            }
          }
          (id, sig)
        }
      }.toDF("id", "sig")
  }

  /** Corpus-derived hot-bucket cap for the LSH band self-join:
    * `max(64, 8 · bitlen(n+1))` where bitlen is the integer bit length
    * (⌈log₂⌉, no floats — the DuckDB replay uses `length(bin(n+1))` and
    * both sides are integer-exact). Rationale: true near-dup clusters at
    * any measured SF are single digits (max natural bucket 7 at sf0.1,
    * n=5000 → cap 104, ~15× headroom), while a spam cluster is unbounded
    * — the cap grows only logarithmically with the corpus, so the worst
    * under-cap bucket emits O(log²n) pairs, never O(n²).
    */
  private[graft] def bucketCap(nDocs: Long): Int =
    math.max(64, 8 * (64 - java.lang.Long.numberOfLeadingZeros(nDocs + 1)))

  /** Candidate pairs from a (id, band, band_hash) bucket table with the
    * hot-bucket cap applied. Buckets at or under the cap emit their full
    * in-bucket clique (the classic LSH candidate set); buckets OVER the
    * cap — spam clusters, boilerplate walls, degenerate shingle sets —
    * are STAR-REDUCED: every member pairs with the bucket's minimum id
    * only, bounding the bucket's pair output at k−1 instead of k(k−1)/2.
    *
    * `maxBucket` > 0 is an explicit cap; ≤ 0 derives [[bucketCap]] from
    * the corpus count IN-PLAN (a 1-row aggregate over `capFrom`
    * cross-joined as a broadcast scalar — `greatest(64, 8·length(bin(n
    * +1)))`, the same integer-exact formula the DuckDB oracle replays).
    * Nothing executes at DataFrame-construction time: for parquet-backed
    * inputs the count compiles to a column-pruned metadata scan inside
    * the same job, and plan dumps / explain stay execution-free.
    *
    * Recall contract (NOT silent truncation): (a) star edges keep every
    * over-cap member visible and connected — connected components over
    * the capped edge set are IDENTICAL to the uncapped ones (a clique and
    * a star on the same vertex set have the same component), so
    * cluster-level consumers (duplicateClusters, leakproof splits,
    * canonical-doc selection) are exact; (b) a direct pair inside an
    * over-cap bucket can still surface via any OTHER band where the two
    * docs share an under-cap bucket; (c) capping is OBSERVABLE at run
    * time: the star branch carries a named `observe` (`lsh_cap_*`:
    * star_edges + max_bucket), surfaced through Spark's standard
    * `QueryExecutionListener`/`StreamingQueryListener` observed-metrics
    * channel, and [[lshBucketStats]] gives the per-bucket breakdown on
    * demand. The cap premise — an over-cap bucket is one near-dup wall,
    * not a coincidence — requires band keys wide enough that random
    * collisions are rare (the 60-bit minhash band hashes, or the
    * corpus-adaptive composite simhash bands); NEVER apply it to narrow
    * fixed keys whose buckets fill with unrelated docs. Pair-LIST
    * consumers that verify each pair (e.g. [[minhashDuplicates]]) keep
    * clique semantics by default — see the contract note there.
    *
    * OBSERVE-NAME CONTRACT: the star branch's metric is named
    * `lsh_cap_<label>` with the label fixed per generator ("minhash",
    * "minhash_portable", "simhash") so plan dumps are stable across
    * sessions and runs. Monitoring consumers should match on the
    * `lsh_cap_` PREFIX, not enumerate names — custom labels widen the
    * space. A single query composing TWO capped generators with the
    * same label would collide at analysis (duplicate CollectMetrics
    * name); pass distinct labels in that case.
    *
    * Plan shape (cap ON): one exchange on (band, band_hash); the
    * per-bucket count and hub come from a single Window over the
    * partition keys (no extra shuffle — only a local sort the SMJ
    * self-join needed regardless); the self-join and the star
    * projection both reuse that exchange. `maxBucket = Int.MaxValue`
    * (the verified-pair default) takes a CLIQUE-ONLY fast path: no
    * bucket can exceed the cap (bucket size is bounded by the Int-sized
    * corpus), so the Window, the cap scalar, the star branch, and the
    * union are all skipped — the plan is exactly the plain
    * repartitioned self-join.
    */
  private def cappedBucketPairs(buckets: DataFrame, maxBucket: Int,
                                capFrom: DataFrame,
                                label: String): DataFrame = {
    val parted = buckets.repartition(col("band"), col("band_hash"))
    if (maxBucket == Int.MaxValue) {
      // cap can never engage — emit the classic in-bucket clique with
      // zero cap plumbing (the Window alone cost d_minhash_verify 1.40×)
      val a = parted.as("a"); val b = parted.as("b")
      return a.join(b,
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .distinct()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val counted = parted
      .withColumn("bkt_n", count(lit(1)).over(w))
      .withColumn("hub", min(col("id")).over(w))
    val tagged =
      if (maxBucket > 0) counted.withColumn("bkt_cap", lit(maxBucket.toLong))
      else counted.crossJoin(broadcast(inPlanCap(capFrom)))
    val small = tagged.filter(col("bkt_n") <= col("bkt_cap"))
    val a = small.as("a")
    val b = small.as("b")
    val clique = a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    // hub = min(id) of the bucket, so a_id < b_id holds by construction.
    // The observe rides the star branch only (it appears ONCE in the
    // plan — the clique self-join would duplicate a metrics node).
    val star = tagged
      .filter(col("bkt_n") > col("bkt_cap") && col("id") =!= col("hub"))
      .observe(s"lsh_cap_$label",
        count(lit(1)).as("star_edges"),
        max(col("bkt_n")).as("max_bucket"))
      .select(col("hub").as("a_id"), col("id").as("b_id"))
    clique.union(star).distinct()
  }

  /** The [[bucketCap]] formula over an in-plan count column — THE one
    * Column-level definition (r18 review: the formula had forked into
    * a hand-inlined Coactivity copy; every capped operator now builds
    * on this or the DuckDB twin).
    */
  private[graft] def capCol(n: Column): Column =
    greatest(lit(64L), (lit(8L) * length(bin(n + 1))).cast("long"))

  /** The [[bucketCap]] formula as a 1-row IN-PLAN scalar over the
    * corpus: `greatest(64, 8·length(bin(n+1)))` — no job executes at
    * DataFrame-construction time, and the DuckDB oracle replays the
    * identical integer arithmetic.
    */
  private[graft] def inPlanCap(capFrom: DataFrame): DataFrame =
    capFrom.agg(count(lit(1)).as("n"))
      .select(capCol(col("n")).as("bkt_cap"))

  /** Per-bucket monitoring stats for the hot-bucket cap: one row per
    * (band, band_hash) with its size, hub (min id), and whether it
    * star-reduces under `cap` — the "no silent truncation" surface a
    * pipeline can alert on (a sudden wave of capped buckets means a spam
    * campaign or a degenerate tokenizer, either way worth eyes).
    */
  def lshBucketStats(buckets: DataFrame, cap: Int): DataFrame =
    buckets.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bkt_n"), min(col("id")).as("hub"))
      .withColumn("capped", col("bkt_n") > cap)

  /** [[lshBucketStats]] with the cap derived in-plan from the corpus
    * (same broadcast-scalar derivation the capped candidate generators
    * use); adds the derived `bkt_cap` as a column so monitoring rollups
    * can report the threshold alongside the breaches.
    */
  def lshBucketStats(buckets: DataFrame, capFrom: DataFrame): DataFrame =
    buckets.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bkt_n"), min(col("id")).as("hub"))
      .crossJoin(broadcast(inPlanCap(capFrom)))
      .withColumn("capped", col("bkt_n") > col("bkt_cap"))

  /** MinHash LSH candidate pairs: band the signature, bucket-join per
    * (band, band-hash). Returns candidate (a_id, b_id) pairs with a < b.
    *
    * Scale notes: the exploded bucket table has n_docs × bands fixed-width
    * rows; the explicit repartition on the join keys means the self-join
    * reuses that single exchange (no re-shuffle) and signature computation
    * stays below the exchange (evaluated once). Degenerate buckets (spam
    * clusters) are bounded by the hot-bucket cap ([[cappedBucketPairs]] —
    * AQE skew splitting redistributes a hot bucket's join but cannot bound
    * its O(k²) pair OUTPUT; the cap can, and star-reduction keeps the
    * cluster structure exact). `maxBucket` ≤ 0 derives the cap from the
    * corpus count IN-PLAN ([[bucketCap]] formula as a broadcast scalar —
    * no construction-time job); the derived cap never engages at any
    * measured natural bucket size, only on planted/spam-grade
    * degeneracy.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 5, bands: Int = 8,
                        rowsPerBand: Int = 2, maxBucket: Int = 0,
                        capLabel: String = "minhash"): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val buckets = sigs.select(
      col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"),
            b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")))))
      .toDF("id", "band", "band_hash")
    cappedBucketPairs(buckets, maxBucket,
      capFrom = df.select(col(idCol)), label = capLabel)
  }

  /** Distinct word shingles in ONE typed pass — the expression-based
    * `TextOps.wordShingles` is a `transform` lambda over an outer column,
    * which interpreted HOF evaluation re-inlines per element (tokenize per
    * shingle ⇒ O(tokens²) per doc, the round-1 pitfall). Here: tokenize
    * once, slide once.
    */
  private[dedup] def shingleSets(df: DataFrame, idCol: String,
                                 textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = tokenize(text)
        val shingles: Array[String] =
          if (toks.isEmpty) Array.empty
          else if (toks.length <= n) Array(toks.mkString(" "))
          else toks.sliding(n).map(_.mkString(" ")).toArray
        (id, shingles.distinct)
      }).toDF("id", "sh")
  }

  /** MinHash near-dup pairs, verified: LSH candidates re-checked with exact
    * n-gram Jaccard ≥ threshold. Shingle recomputation only touches
    * candidate ids, not the corpus.
    *
    * CONTRACT NOTE — the hot-bucket cap defaults OFF here
    * (`maxBucket = Int.MaxValue`), unlike the candidate generators: this
    * op's OUTPUT is the verified pair list, and star-reduction inside a
    * hot bucket replaces true pairs (x, y) with hub pairs whose Jaccard
    * may fall below the threshold (the hub can be a low-similarity
    * interloper — one band agreement only needs simᵖ), silently dropping
    * verified duplicates. A duplicate wall of k docs inherently has
    * Θ(k²) pairs, so no cap can bound this op's output without changing
    * its meaning; at corpus scale either run [[exact]] dedup first
    * (collapses the wall) or consume clusters via the capped candidates
    * + [[duplicateClusters]], whose component structure the cap
    * preserves exactly. An explicit `maxBucket` opts in consciously.
    */
  def minhashDuplicates(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 5,
                        bands: Int = 8, rowsPerBand: Int = 2,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleN, bands,
      rowsPerBand, maxBucket)
    val sh = shingleSets(df, idCol, textCol, shingleN)
    cands
      .join(sh.toDF("a_id", "a_sh"), Seq("a_id"))
      .join(sh.toDF("b_id", "b_sh"), Seq("b_id"))
      .withColumn("jaccard",
        round(TextOps.jaccard(col("a_sh"), col("b_sh")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Modulus of the portable MinHash hash space: 2^60. All md5-prefix
    * hashes are < 2^60, so the sentinel `M60` itself marks "no shingles".
    */
  private[dedup] val M60 = 1L << 60

  /** Portable MinHash signatures: 60-bit md5-prefix shingle hashes, k
    * "permutations" via the 2-hash scheme in Z_{2^60} — h_i = (h1 + i·h2)
    * mod 2^60 never wraps a 64-bit long (each step adds h2 < 2^60 to a
    * value < 2^60 then reduces), so any engine with md5 + 128-bit
    * arithmetic (DuckDB HUGEINT) reproduces the signature bit-for-bit.
    * ~2× the hashing cost of [[minhashSignatures]] (murmur): use that at
    * 100 TB, this when results must verify across engines. Docs with no
    * tokens get all-sentinel signatures (M60 > every real hash).
    */
  def minhashSignaturesPortable(df: DataFrame, idCol: String,
                                textCol: String, k: Int,
                                shingleN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) => (id, portableSig(md, text, k, shingleN)) }
      }.toDF("id", "sig")
  }

  private def portableSig(md: java.security.MessageDigest, text: String,
                          k: Int, shingleN: Int): Array[Long] = {
    val sig = Array.fill(k)(M60)
    val toks = tokenize(text)
    if (toks.nonEmpty) {
      val shingles =
        if (toks.length <= shingleN) Iterator(toks.mkString(" "))
        else toks.sliding(shingleN).map(_.mkString(" "))
      shingles.foreach { sh =>
        val h1 = md5h60(md, sh)
        val h2 = md5h60(md, "x" + sh) | 1L // odd => full period in Z_{2^60}
        var i = 0
        var h = h1
        while (i < k) {
          if (h < sig(i)) sig(i) = h
          h = (h + h2) % M60
          i += 1
        }
      }
    }
    sig
  }

  /** Portable LSH buckets: (id, band, band_hash) with band_hash = 60-bit
    * md5 prefix of the band's signature slice joined with ','. One typed
    * pass (signature + banding fused — nothing but fixed-width bucket rows
    * ever shuffles).
    */
  def minhashBucketsPortable(df: DataFrame, idCol: String, textCol: String,
                             shingleN: Int, bands: Int,
                             rowsPerBand: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val sig = portableSig(md, text, k, shingleN)
          (0 until bands).iterator.map { b =>
            val key = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
              .mkString(",")
            (id, b, md5h60(md, key))
          }
        }
      }.toDF("id", "band", "band_hash")
  }

  /** Portable MinHash LSH candidate pairs — same capped join shape as
    * [[minhashCandidates]] over the portable buckets (hot-bucket cap +
    * star-reduction contract documented at [[cappedBucketPairs]];
    * `maxBucket` ≤ 0 derives [[bucketCap]] from the corpus count).
    */
  def minhashCandidatesPortable(df: DataFrame, idCol: String,
                                textCol: String, shingleN: Int = 5,
                                bands: Int = 8,
                                rowsPerBand: Int = 2,
                                maxBucket: Int = 0,
                                capLabel: String = "minhash_portable")
      : DataFrame = {
    val buckets = minhashBucketsPortable(df, idCol, textCol, shingleN,
      bands, rowsPerBand)
    cappedBucketPairs(buckets, maxBucket,
      capFrom = df.select(col(idCol)), label = capLabel)
  }

  /** Portable verified MinHash duplicates — exact-Jaccard recheck over the
    * portable candidates (same shape as [[minhashDuplicates]], including
    * its contract note: the hot-bucket cap defaults OFF for pair-list
    * verification — the oracle replays clique semantics at every scale).
    */
  def minhashDuplicatesPortable(df: DataFrame, idCol: String,
                                textCol: String, threshold: Double,
                                shingleN: Int = 5, bands: Int = 8,
                                rowsPerBand: Int = 2,
                                maxBucket: Int = Int.MaxValue): DataFrame = {
    val cands = minhashCandidatesPortable(df, idCol, textCol, shingleN,
      bands, rowsPerBand, maxBucket)
    val sh = shingleSets(df, idCol, textCol, shingleN)
    cands
      .join(sh.toDF("a_id", "a_sh"), Seq("a_id"))
      .join(sh.toDF("b_id", "b_sh"), Seq("b_id"))
      .withColumn("jaccard",
        round(TextOps.jaccard(col("a_sh"), col("b_sh")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 60-bit md5-prefix token hash: first 15 hex chars of md5(token). ~2×
    * slower than murmur but portable — any engine with md5 (DuckDB, Trino,
    * …) reproduces it bit-for-bit, which is what makes the simhash oracle-
    * checkable across engines.
    */
  private[dedup] def md5h60(md: java.security.MessageDigest,
                            s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 7.5 bytes = 15 hex chars = 60 bits
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) |
      ((d(2) & 0xFFL) << 36) | ((d(3) & 0xFFL) << 28) |
      ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  /** SimHash signatures: bit i = majority over token hashes' bit i.
    * Single typed pass: one tokenization, one hash per token, branch-free
    * counter update. Output (id: long, simhash: long).
    *
    * `tokenHash` picks the token hash: "murmur" (64-bit, fastest — the
    * 100 TB default) or "md5" (60-bit md5 prefix, engine-portable so the
    * signature is verifiable against an independent SQL engine).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        tokenHash: String = "murmur"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val useMd5 = tokenHash match {
      case "md5" => true
      case "murmur" => false
      case other => throw new IllegalArgumentException(
        s"tokenHash must be 'murmur' or 'md5', got '$other'")
    }
    val nBits = if (useMd5) 60 else 64
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = if (useMd5)
          java.security.MessageDigest.getInstance("MD5") else null
        it.map { case (id, text) =>
          val counts = new Array[Int](nBits)
          val toks = tokenize(text)
          var t = 0
          while (t < toks.length) {
            val h = if (useMd5) md5h60(md, toks(t)) else h64(toks(t), 0)
            var i = 0
            while (i < nBits) {
              counts(i) += ((h >>> i) & 1L).toInt
              i += 1
            }
            t += 1
          }
          var sig = 0L
          var i = 0
          while (i < nBits) {
            if (counts(i) * 2 >= toks.length) sig |= (1L << i)
            i += 1
          }
          (id, sig)
        }
      }.toDF("id", "simhash")
  }

  /** SimHash near-dup candidates over a CORPUS-ADAPTIVE Hamming-LSH
    * layout: band masks come from [[phashBandMasks]] (m signature
    * blocks, bands = all (m−t)-subsets as single bit-masks), so recall
    * is pigeonhole-exact for Hamming ≤ `maxHamming` at EVERY corpus
    * size. This replaces the fixed 4 × 16-bit banding, whose 2¹⁶-value
    * band keys fill with UNRELATED docs once n outruns the key space
    * (at 10M docs the AVERAGE 16-bit bucket already holds ~150
    * coincidental members) — the same key-space problem the perceptual-
    * hash tier solved in r11, solved with the same machinery. At tiny
    * corpora (n ≲ 2⁸, where expected random collisions per 16-bit band
    * are < 0.5) the derivation lands on exactly the legacy 4
    * single-block bands (64-bit murmur signature, t = 3); the layout
    * widens as soon as n² outruns the band space — already m = 5 at
    * n = 1000.
    *
    * Because adaptive band keys always carry ≥ ceil(log2 n)+8 bits,
    * an over-cap bucket is a genuine near-dup wall (members agree on a
    * wide band, not a 16-bit coincidence) — which is what makes the
    * [[cappedBucketPairs]] hot-bucket star-reduction SOUND here. The
    * count deriving the mask layout cannot be an in-plan scalar (the
    * mask LIST shapes the plan), so with no explicit `nDocs` the
    * signatures are computed ONCE into a `localCheckpoint` and counted
    * there — the expensive per-token hashing pass is never evaluated
    * twice, and the count itself reads 16-byte cached rows. Callers
    * that already know the corpus size (or need the signatures
    * downstream anyway) pass `nDocs` ≥ 0 / use
    * [[simhashCandidatesFromSigs]] and skip the checkpoint.
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3,
                        tokenHash: String = "murmur",
                        maxBucket: Int = 0,
                        nDocs: Long = -1L): DataFrame = {
    val nBits = if (tokenHash == "md5") 60 else 64
    if (nDocs >= 0L)
      simhashCandidatesFromSigs(
        simhashSignatures(df, idCol, textCol, tokenHash),
        nDocs = nDocs, maxHamming = maxHamming, hashBits = nBits,
        maxBucket = maxBucket)
    else {
      val sigs = simhashSignatures(df, idCol, textCol, tokenHash)
        .localCheckpoint()
      simhashCandidatesFromSigs(sigs, nDocs = sigs.count(),
        maxHamming = maxHamming, hashBits = nBits, maxBucket = maxBucket)
    }
  }

  /** [[simhashCandidates]] from PRECOMPUTED signatures (id, simhash)
    * plus an explicit corpus count: callers that also need the
    * signatures downstream (a Hamming-verify join, cluster canonical
    * selection) run the expensive per-token hashing pass ONCE —
    * typically behind a `localCheckpoint` — instead of once inside the
    * candidate generator and again for the join.
    */
  def simhashCandidatesFromSigs(sigs: DataFrame, nDocs: Long,
                                maxHamming: Int = 3, hashBits: Int = 64,
                                maxBucket: Int = 0,
                                capLabel: String = "simhash"): DataFrame = {
    val masks = phashBandMasks(nDocs, maxHamming, hashBits)
    val buckets = sigs.select(col("id"), posexplode(array(
      masks.map(m => col("simhash").bitwiseAND(lit(m))): _*)))
      .toDF("id", "band", "band_hash")
    // the caller supplies the corpus count, so a derived cap is the
    // LITERAL bucketCap(nDocs) — never the in-plan scalar, whose count
    // aggregate would re-evaluate an un-checkpointed signature plan (a
    // second full per-token hashing pass over the corpus)
    val mb = if (maxBucket <= 0) bucketCap(nDocs) else maxBucket
    cappedBucketPairs(buckets, mb,
      capFrom = sigs.select(col("id")), label = capLabel)
  }

  /** Duplicate clusters: connected components over a near-dup candidate
    * edge list — the standard post-pass after MinHash/SimHash/embedding
    * candidate generation ("keep one doc per duplicate cluster"). Returns
    * (id, cluster_id) with cluster_id = the smallest id in the component.
    *
    * Alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond"):
    *
    *  - large-star: every node u re-attaches its strictly LARGER
    *    neighbors to m(u) = min(Γ(u) ∪ {u});
    *  - small-star: every node u re-attaches itself and its smaller
    *    neighbors to their collective minimum.
    *
    * Both operations preserve connectivity exactly, and the edge set
    * converges to STARS centered at each component's minimum id in
    * O(log n) rounds REGARDLESS of component diameter — the property
    * plain min-label propagation (O(diameter) rounds) lacks: an
    * adversarial boilerplate chain at corpus scale (a gradient of
    * near-dup docs, each linked only to its neighbors) converges in
    * ~log₂(depth) rounds here instead of depth rounds. Each round is
    * two small groupBy/join passes over fixed-width (long, long) edge
    * rows; `localCheckpoint` truncates the iterative lineage so plans
    * don't grow unboundedly — the classic Spark iterative-algorithm
    * trap.
    *
    * CONTRACT: `edges` must reference only ids present in `nodes`
    * (edges ⊆ nodes × nodes). The star rounds compute component roots
    * over ALL edge endpoints, so a stray endpoint outside `nodes`
    * would not only label itself — it can BECOME `cluster_id` for the
    * nodes it touches (the root is the minimum over the whole
    * component, known or not). Every in-repo caller derives edges
    * from the same id universe as nodes; callers composing external
    * edge lists must semi-join them against `nodes` first.
    */
  def duplicateClusters(nodes: DataFrame, edges: DataFrame, idCol: String,
                        maxIter: Int = 25,
                        loopPartitions: Int = 0): DataFrame = {
    // each round is a tiny shuffle (one row per edge) repeated many
    // times — at the session's full shuffle width the per-round
    // task-launch overhead dominates. The loop runs at its own width via
    // EXPLICIT repartition on the loop keys (never by mutating the
    // session-global shuffle.partitions, which would silently re-plan
    // concurrent queries). loopPartitions <= 0 (default) auto-derives
    // the width from the materialized edge count, so a 100 TB candidate
    // set is never funneled through a fixed 8-partition loop; the count
    // reads the already-checkpointed edge set, not the (expensive)
    // candidate-generation plan.
    // Edges kept DIRECTED large→small (hi > lo) from the start — built
    // with greatest/least so the (possibly expensive) candidate-pair
    // plan is traversed ONCE, where the former edges ∪ reversed-edges
    // union executed it twice inside the first checkpoint. Deduped and
    // partitioned by (hi, lo) — the SAME key the per-round dedup and
    // the convergence diff use, so both ride this partitioning with no
    // further exchange.
    val rawBase = edges.select(
        greatest(col("a_id").cast("long"), col("b_id").cast("long"))
          .as("hi"),
        least(col("a_id").cast("long"), col("b_id").cast("long"))
          .as("lo"))
      .filter(col("hi") =!= col("lo"))
    val (e0, width) =
      if (loopPartitions > 0)
        (rawBase.repartition(loopPartitions, col("hi"), col("lo"))
          .dropDuplicates("hi", "lo").localCheckpoint(), loopPartitions)
      else {
        // the edge count rides the SAME job that materializes the
        // checkpoint (observe), instead of a second count job over
        // the cached rows (r19 — the loop is job-count bound)
        val cObs = org.apache.spark.sql.Observation()
        val raw = rawBase
          .observe(cObs, count(lit(1)).as("n")).localCheckpoint()
        // autoLoopWidth is calibrated in SYMMETRIC edge rows (2|E|)
        val w = autoLoopWidth(2L * cObs.get("n").asInstanceOf[Long])
        val s = raw.repartition(w, col("hi"), col("lo"))
          .dropDuplicates("hi", "lo").localCheckpoint()
        raw.unpersist()
        (s, w)
      }
    var e = e0
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u"))
    val wHi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hi"))
    // One LARGE-STAR + SMALL-STAR round as a frame transform.
    // LARGE-STAR: symmetrize, take each node's neighborhood min (with
    // itself — one Window min over the u-exchange, no self-join),
    // re-attach strictly larger neighbors to it. Output rows are
    // (v, m) with v > u ≥ m, so the directed hi > lo form is
    // preserved by construction.
    // SMALL-STAR on the directed view: node u re-attaches itself and
    // ALL its smaller neighbors to their collective min (again a
    // Window min riding one hi-exchange; the two output branches
    // share that exchange via ReusedExchange) — flattening
    // multi-parent nodes into stars. Duplicate emissions collapse in
    // the (hi, lo) dedup — without it the edge multiset could double
    // every round.
    def round(cur: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val ls = cur.select(col("hi").as("u"), col("lo").as("v"))
        .union(cur.select(col("lo").as("u"), col("hi").as("v")))
        .repartition(width, col("u"))
        .withColumn("m", least(col("u"), min(col("v")).over(wU)))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("hi"), col("m").as("lo"))
      val lsW = ls.repartition(width, col("hi"))
        .withColumn("m", min(col("lo")).over(wHi))
      lsW.filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(lsW.select(col("hi"), col("m").as("lo")))
        .repartition(width, col("hi"), col("lo"))
        .dropDuplicates("hi", "lo")
    }
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // ONE round per materialized job. r19 NOTE — two-rounds-per-job
      // fusion was implemented, PROVEN result-equivalent (the integer
      // potential Φ(E) = Σ (hi+lo+1) strictly decreases under any
      // non-identity star application, so a double-round fixpoint
      // forces a single-round fixpoint — property-pinned in
      // AsofClusterSpec), and then REVERTED on measurement: the fused
      // job ran 2-3× a single round's wall time (AQE re-optimizes and
      // schedules each of the doubled plan's shuffle stages
      // sequentially, so per-job latency scales with plan DEPTH, not
      // job count) and the double-round diff needs one extra inner
      // round to observe convergence — j_spatial_dbscan measured
      // 4.6 s → 8.2 s fused. The loop's real fixed cost is stage-wave
      // latency, which fusing makes worse, not better.
      // The symmetric-difference count rides the SAME job that
      // materializes the round result: full-outer join against the
      // previous edge set (both sides (hi, lo)-partitioned — no
      // exchange), an `observe` counting one-sided rows, then the
      // new side filtered back out. One Spark job per round, total.
      val obs = org.apache.spark.sql.Observation()
      val ss = round(e).withColumn("in_new", lit(1))
        .join(e.withColumn("in_old", lit(1)), Seq("hi", "lo"),
          "full_outer")
        .observe(obs, count(when(col("in_new").isNull ||
          col("in_old").isNull, 1)).as("changed"))
        .filter(col("in_new").isNotNull)
        .select(col("hi"), col("lo"))
        .localCheckpoint()
      val changed = obs.get("changed").asInstanceOf[Long]
      e.unpersist()
      e = ss
      converged = changed == 0L
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $iter changed=$changed " +
          s"t=${System.nanoTime() / 1000000}")
    }
    require(converged, s"large-star/small-star did not converge in " +
      s"$maxIter rounds — raise maxIter")
    // at the fixpoint e is a set of stars (hub = component min), so each
    // non-hub node appears exactly once as hi; the min() is a defensive
    // no-op that keeps the mapping well-defined even on that invariant.
    // The result is checkpointed id-partitioned (the old contract):
    // consumers read cached fixed-width rows, never re-run the mapping.
    val mapping = e.groupBy(col("hi").as("id"))
      .agg(min(col("lo")).as("root"))
    val out = nodes.select(col(idCol).cast("long").as("id"))
      .join(mapping, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("root"), col("id")).as("cluster_id"))
      .repartition(width, col("id"))
      .localCheckpoint()
    e.unpersist()
    out
  }

  /** Band-index maintenance: compact a band-partitioned parquet index
    * dir in place, optionally dropping expired entries. Per-batch
    * appends (d_incremental_index_append) accumulate one file per band
    * per batch forever; this rewrite re-clusters each band partition to
    * a single band_hash-sorted file (footer min/max stay tight for
    * row-group skipping) and applies `retain` — the TTL/retention
    * predicate — during the same pass, so expiry costs no extra scan.
    *
    * The swap commits via [[graft.ops.AtomicSwap]] (rewrite-to-sibling +
    * rename-aside; crash-window analysis and the single-writer
    * assumption live on that object) — the same protocol the IVF index
    * recenter uses. Cost is one scan + one write of the LIVE index
    * rows — never proportional to the number of accumulated appends.
    */
  def compactBandIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String,
                       retain: Column = lit(true)): Unit =
    graft.ops.AtomicSwap.rewrite(path) { tmp =>
      // explicit width (bare keyed repartitions are AQE-coalescible
      // down to one task on a small index — r18); keyed by band, so
      // the one-file-per-band compaction contract is unchanged.
      // Width is DATA-SCALED (r19, guide §2.2): compaction is a
      // plain rewrite (~no per-row compute), so 256 KB/task bounds
      // task overhead on small indexes; at scale it saturates the
      // session conf as before.
      val live = spark.read.parquet(path).filter(retain)
      live
        .repartition(graft.ops.Width.scaled(live, 256L << 10),
          col("band"))
        .sortWithinPartitions(col("band_hash"))
        .write.partitionBy("band").parquet(tmp)
    }

  /** Crash recovery for [[compactBandIndex]]'s rename-aside swap —
    * [[graft.ops.AtomicSwap.recover]] on the band-index dir (idempotent,
    * SINGLE-WRITER; see that scaladoc for the two crash windows).
    */
  def recoverBandIndex(path: String): Unit =
    graft.ops.AtomicSwap.recover(path)

  /** Loop width for [[duplicateClusters]] when not given explicitly:
    * one partition per ~2M symmetric edge rows, floored at 8 (small
    * candidate sets stay at the overhead-minimizing width) and capped at
    * 20k (HashPartitioner sanity at extreme edge counts). Monotone in
    * the edge count, so the CC loop widens with the candidate set
    * instead of funneling a corpus-scale edge list through 8 partitions.
    */
  private[graft] def autoLoopWidth(
      symEdgeRows: Long, rowsPerPartition: Long = 2000000L): Int =
    math.max(8L, math.min(20000L,
      (symEdgeRows + rowsPerPartition - 1) / rowsPerPartition)).toInt

  /** Embedding near-dup: pairs with cosine ≥ threshold, brute force within
    * deterministic random-hyperplane LSH buckets (plane p's component for
    * dim i = ±1 by xxhash64(i, p) parity — recomputable anywhere, no stored
    * centroids).
    *
    * SCALE NOTE: this is the single-table LSH baseline — within-bucket
    * work is ~n²∕2^nPlanes, and adding planes to chase the corpus trades
    * recall (one table, no banding), so at corpus scale the embedding
    * near-dup path is [[semDedup]]/[[semDedupAuto]] (corpus-scaled cell
    * count, fused argmax assignment) or the ANN tier; the hot-bucket
    * star-cap is deliberately NOT applied here because the output is a
    * thresholded pair list (same contract as [[minhashDuplicates]] —
    * hub pairs below the cosine threshold would drop true pairs).
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, nPlanes: Int = 8): DataFrame = {
    import graft.functions.vector._
    // Exchange on the bucket key: hyperplane projections computed once per
    // vector, self-join pre-partitioned on bucket. All vector math is the
    // codegen'd kernels (graft.functions) — fused loops, no boxing.
    val prepped = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lsh_bucket(col(vecCol), nPlanes).as("bucket"))
      .repartition(col("bucket"))
    val a = prepped.as("a"); val b = prepped.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .withColumn("cosine",
        round(vec_cosine(col("a.vec"), col("b.vec")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), col("cosine"))
  }

  /** Cross-document span scrub — the ACTION counterpart of the
    * repeated-span DETECTION op (`d_substring_spans`): documents are cut
    * into non-overlapping `spanTokens`-token chunks, every chunk whose
    * exact text occurs in ≥ `minDocs` DISTINCT documents is removed from
    * ALL of them, and each document's text is rebuilt from its surviving
    * chunks in order (the C4/RefinedWeb "remove duplicated spans/lines"
    * curation rule; removing every occurrence — rather than C4's
    * keep-first — is deliberate: it is order-free, so the result does
    * not depend on dataset ordering and replays on any engine).
    *
    * Scale shape: one explode to (doc, j, chunk); hot-chunk discovery is
    * a groupBy on the chunk key (at 100 TB hash the chunk first so the
    * exchange carries 8-byte keys); the scrub is a left-anti equi join;
    * reassembly is a per-doc sort of surviving (j, chunk) structs —
    * everything partial-aggregates and nothing is quadratic.
    *
    * Returns one row per input document:
    * (doc_id, n_chunks, n_removed, scrubbed) — scrubbed is the rebuilt
    * text ('' when everything was removed).
    */
  def spanScrub(df: DataFrame, idCol: String, textCol: String,
                spanTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val chunks = toks.select(col("doc_id"), posexplode(expr(
      s"""transform(
         |  sequence(0, greatest(CAST(ceil(size(toks) / $spanTokens.0D)
         |    AS INT), 1) - 1),
         |  j -> array_join(slice(toks, j * $spanTokens + 1, $spanTokens),
         |    ' '))""".stripMargin)).as(Seq("j", "chunk")))
    val hot = chunks.select(col("chunk"), col("doc_id")).distinct()
      .groupBy(col("chunk")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("chunk"))
    val perDoc = chunks.join(hot, Seq("chunk"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("j"), col("chunk")))),
          x => x.getField("chunk")), " ").as("scrubbed"))
    // totals come straight from the token count — no second explode of
    // the corpus (same ceil formula as the chunk builder above)
    val totals = toks.select(col("doc_id"),
      greatest(expr(s"CAST(ceil(size(toks) / $spanTokens.0D) AS INT)"),
        lit(1)).cast("long").as("n_chunks"))
    totals.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"))
  }

  /** Recall-exact Hamming-LSH band layout, auto-widened from the corpus
    * size (the perceptual-hash analogue of [[autoSemDedupClusters]]).
    * The `hashBits`-bit signature is split into `m` contiguous blocks;
    * bands are ALL (m−t)-subsets of blocks, each returned as ONE
    * bit-mask over the signature — two signatures collide in a band iff
    * `(a & mask) == (b & mask)`, i.e. every block the band covers
    * matches. Recall exactness is pure pigeonhole and holds for EVERY
    * m > t: ≤ t differing bits dirty ≤ t blocks, leaving ≥ m−t clean
    * blocks, and the band over (a subset of) those clean blocks has no
    * differing bit — so every true pair at the Hamming threshold
    * collides in ≥ 1 band regardless of how wide the layout is.
    *
    * Widening trades band count for band width: expected RANDOM
    * collision pairs per band ≈ n²∕2^bits, so `m` is the smallest
    * block count whose narrowest band reaches ceil(log2 n) + 8 bits
    * (random-collision verify work ≈ n∕256 pairs — linear in the
    * corpus), capped at m = 9 — for the default t = 2 that is C(9,2) =
    * 36 bands of ≥ 49 bits, collision-safe past 2^40 assets. At the
    * test SFs (n ≲ 10⁴, t = 2) the derivation lands on m = 3 — the
    * legacy 3 × 21-bit layout — so small-corpus results and oracles
    * are bit-identical; the widening engages only when n² outruns the
    * band space.
    */
  def phashBandMasks(corpusRows: Long, maxHamming: Int,
                     hashBits: Int = 63): Seq[Long] = {
    val t = maxHamming
    // 64 supported since r12 (the full-width simhash signature): block
    // masks are built with an unsigned right shift of -1L, which is
    // well-defined at EVERY width 1..64 — including the t = 0, m = 1
    // degenerate layout whose single block spans all 64 bits (a
    // left-shift construction would wrap mod 64 there and produce an
    // all-zero mask, i.e. one bucket for the whole corpus). The top
    // block's mask can be a negative long; bucket equality on
    // `sig & mask` is sign-agnostic.
    require(hashBits > 0 && hashBits <= 64, s"hashBits $hashBits")
    require(t >= 0 && t < hashBits,
      s"maxHamming $t out of range for $hashBits-bit signatures")
    val mCap = math.min(9, hashBits)
    // a cap below t+1 cannot happen for the supported hashBits range
    // (t < hashBits ≤ 63 and t ≤ 8 in practice), but guard anyway
    require(t + 1 <= mCap,
      s"maxHamming $t needs ${t + 1} blocks, cap is $mCap")
    def minBandBits(m: Int): Int = (m - t) * (hashBits / m)
    val n = math.max(corpusRows, 2L)
    val requiredBits = math.min(
      (t + 1 to mCap).map(minBandBits).max,
      64 - java.lang.Long.numberOfLeadingZeros(n - 1) + 8)
    val m = (t + 1 to mCap).find(minBandBits(_) >= requiredBits)
      .getOrElse(mCap)
    val w = hashBits / m
    val r = hashBits % m
    val widths = Seq.tabulate(m)(i => if (i < r) w + 1 else w)
    val offsets = widths.scanLeft(0)(_ + _)
    val blockMasks = widths.zip(offsets).map { case (bw, off) =>
      (-1L >>> (64 - bw)) << off
    }
    blockMasks.combinations(m - t).map(_.reduce(_ | _)).toSeq
  }

  /** Cluster count for [[semDedup]] when derived from the corpus size:
    * one cell per ~`targetOccupancy` vectors, floored at 2 (greatest()
    * needs two cells) and capped at 65536 (centroid literals stay
    * metadata-sized: 64k × 64 floats ≈ 16 MB, the broadcast ceiling).
    * Monotone in the corpus count, so within-cell pairwise work stays
    * ~occupancy² per cell as the corpus grows — the SemDeDup quadratic
    * knob auto-tunes like [[autoLoopWidth]] does for the CC loop,
    * instead of being a fixed parameter nothing re-tunes.
    */
  private[graft] def autoSemDedupClusters(
      corpusRows: Long, targetOccupancy: Long = 128L): Int =
    math.max(2L, math.min(65536L,
      (corpusRows + targetOccupancy - 1) / targetOccupancy)).toInt

  /** [[semDedup]] with the cluster count derived from the corpus size
    * via [[autoSemDedupClusters]] — one count(*) (parquet-footer cheap)
    * keys the occupancy target. The oracle replays the same derivation
    * in SQL (`OracleGen.semDedupAutoSql`'s subquery LIMIT), so the
    * auto-scaled operator stays under the exact-hash gate.
    *
    * SCALE REGIME (measured by `probe_semdedup_heavy`, r13): the
    * occupancy-targeted derivation bounds the WITHIN-CELL quadratic
    * (pairs ≈ n·occupancy) but makes centroid ASSIGNMENT O(n·k) with
    * k ∝ n — an n² ∕ occupancy term while k is below the 65536-cell
    * cap (the probe shows ~13× at 8× data, exactly n·k), and linear
    * with a large constant once the cap pins k (n > ~8.4M at the
    * default occupancy). This is inherent to flat SemDeDup assignment;
    * at corpus scale the upgrade is a two-level (hierarchical) coarse
    * quantizer — assign to √k super-cells, then cells within —
    * O(n·√k) with identical cell semantics, or the IVF/PQ ANN tier
    * outright. The fused [[graft.functions.vector]] argmax keeps the
    * constant small; nothing here is corpus × corpus.
    */
  def semDedupAuto(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double,
                   targetOccupancy: Long = 128L): DataFrame = {
    // ONE materialization serves both the corpus count keying the
    // cluster derivation and the multi-pass clustering itself (training
    // sample, assignment, pairwise self-join) — without it, a computed
    // upstream frame is fully re-evaluated by the count() alone. The
    // projection bounds the checkpoint to the two columns the algorithm
    // reads; blocks are MEMORY_AND_DISK so nothing requires the corpus
    // to fit in executor memory.
    val proj = df.select(col(idCol), col(vecCol)).localCheckpoint()
    semDedup(proj, idCol, vecCol,
      autoSemDedupClusters(proj.count(), targetOccupancy), threshold)
  }

  /** Super-cell count for the two-level assignment: ⌈√k⌉ clamped to
    * [2, 256] — balances the two assignment scans (n·√k each). IEEE
    * sqrt is correctly rounded in both the JVM and DuckDB, so the
    * oracle replays `ceil(sqrt(k))` bit-identically.
    */
  private[graft] def autoSuperCells(k: Int): Int =
    math.max(2, math.min(256, math.ceil(math.sqrt(k.toDouble)).toInt))

  /** [[semDedupAuto]] with TWO-LEVEL (hierarchical) cell assignment —
    * the named upgrade for the flat path's O(n·k) assignment term
    * (measured ~20× at 8× data by `probe_semdedup_heavy` while k grows
    * with the corpus): vectors argmax over ⌈√k⌉ SUPER-centroids first,
    * then over only the sub-centroids whose own nearest super matches —
    * O(n·√k) total, the IVF coarse-quantizer pattern applied to
    * SemDeDup. Cell semantics are the standard hierarchical
    * approximation of nearest-centroid (exactly what production
    * SemDeDup/faiss deployments run); within-cell pruning is unchanged.
    *
    * Every step reuses the deterministic, oracle-replayable kernels:
    * both centroid sets come from [[graft.similarity.Knn.kmeansCentroids]]
    * (sample-bounded, 6-dp-rounded), the sub→super map is ONE tiny
    * Spark job over the k centroid rows through the same fused argmax
    * expression, and the vector pass is a pure map (super argmax) + a
    * broadcast join on the super id + one partial-aggregated max-struct
    * per vector — no shuffle wider than one row per vector. Supers that
    * win no sub-centroid are excluded from the vector argmax, so every
    * vector lands in a non-empty super and no row is ever dropped.
    *
    * Returns (vec_id, cell, kept) — [[semDedup]]'s schema.
    */
  def semDedupHierarchical(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double,
                           targetOccupancy: Long = 128L): DataFrame = {
    import graft.functions.vector._
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("vec")).localCheckpoint()
    val k = autoSemDedupClusters(proj.count(), targetOccupancy)
    val nSuper = autoSuperCells(k)
    val subs = graft.similarity.Knn.kmeansCentroids(
      proj, "vec_id", "vec", k)
    val sups = graft.similarity.Knn.kmeansCentroids(
      proj, "vec_id", "vec", nSuper)
    if (subs.isEmpty || sups.isEmpty)
      // empty corpus: no centroids to route through — emit the schema
      // over zero rows (the oracle's `cells` CTE is likewise empty).
      // Single-survivor centroid sets at either level stay ON the
      // two-level path (the argmax kernel handles 1-element centroid
      // lists), keeping Spark and the oracle replay identical for
      // degenerate corpora too.
      return proj.select(col("vec_id"),
        lit(null).cast("long").as("cell"), lit(true).as("kept"))
    // sub-centroid → super map: k rows through the SAME fused argmax
    // kernel every other assignment uses (oracle-replayable), collected
    // once (k ≤ 65536 — metadata-sized, like the centroids themselves)
    val submap = subs.toDF("cid", "cvec")
      .withColumn("sup", vec_argmax_cosine(col("cvec"), sups))
      .select(col("sup"), col("cid"), col("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val effSupIds = submap.map(_._1).toSet
    val effSups = sups.filter { case (sid, _) => effSupIds.contains(sid) }
    val bySuper = submap.toSeq.toDF("sup", "cid", "cvec")
    // LEFT join: a null (or null-element) embedding makes the argmax
    // null — the row must flow through with cell = null / kept = true
    // (the flat [[semDedup]] path's behavior), never be dropped: one
    // output row per input row is this op's schema contract
    val assigned = proj
      .withColumn("sup", vec_argmax_cosine(col("vec"), effSups))
      .join(broadcast(bySuper), Seq("sup"), "left")
      .withColumn("cs", vec_cosine(col("vec"), col("cvec")))
      // max over (cosine, cid) structs = argmax with the cid-DESC tie
      // break the flat argmax kernel and the oracle replay both use;
      // partial aggregation collapses the per-super fanout map-side, so
      // only one row per vector ever shuffles
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cs"), col("cid"))).as("m"),
        first(col("vec")).as("vec"))
      .select(col("vec_id"), col("m.cid").as("cell"), col("vec"))
      .repartition(col("cell"))
    val a = assigned.as("a"); val b = assigned.as("b")
    val removed = a.join(b, col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(round(vec_cosine(col("a.vec"), col("b.vec")), 6)
        >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("rm", lit(true))
    assigned.select(col("vec_id"), col("cell"))
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("rm").isNull.as("kept"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the deterministic
    * 2-pass Lloyd k-means ([[graft.similarity.Knn.kmeansCentroids]]),
    * then prune WITHIN each cluster — a vector is removed when a
    * lower-id vector in the same cluster has cosine ≥ `threshold`
    * (greedy min-id canonical, the standard SemDeDup approximation of
    * the transitive closure).
    *
    * Scale shape: centroids are metadata (k×dim, collected once, inlined
    * as literals), cluster assignment is a PURE MAP over the corpus
    * (argmax over centroid structs — no join, no shuffle), and the
    * pairwise cosine is an equi self-join on `cell` — the quadratic work
    * is confined inside clusters exactly like the LSH band join, never
    * corpus × corpus. At 100 TB the corpus is written partitioned by
    * `cell` so the self-join is co-located and partition-pruned.
    *
    * Returns one row per input vector: (vec_id, cell, kept).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nClusters: Int, threshold: Double): DataFrame = {
    import graft.functions.vector._
    val cents = graft.similarity.Knn.kmeansCentroids(
      df, idCol, vecCol, nClusters)
    val base = df
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
    // degenerate corpus (<2 centroids): greatest() needs ≥2 args — assign
    // every vector to the LONE SURVIVING centroid's id (a cluster that
    // keeps all members after ties can be any seed id, not 0; the oracle
    // labels cells by that id) or 0 for an empty corpus, and let the
    // (trivial) pairwise pass run unchanged
    val withCell =
      if (cents.length < 2)
        base.withColumn("cell",
          lit(cents.headOption.map(_._1).getOrElse(0L)))
      else
        // fused native argmax (bit-identical to the greatest-over-
        // structs expansion): the expansion exceeds the JVM 64 KB
        // codegen limit at auto-scaled cell counts (k ≈ 500 at 32×)
        // and went interpreted — measured 68× for 32× data before
        base.withColumn("cell", vec_argmax_cosine(col("vec"), cents))
    val assigned = withCell.repartition(col("cell"))
    val a = assigned.as("a"); val b = assigned.as("b")
    val removed = a.join(b, col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(round(vec_cosine(col("a.vec"), col("b.vec")), 6)
        >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("rm", lit(true))
    assigned.select(col("vec_id"), col("cell"))
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("rm").isNull.as("kept"))
  }
}
