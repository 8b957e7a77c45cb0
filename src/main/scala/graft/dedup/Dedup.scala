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

  /** MinHash LSH candidate pairs: band the signature, bucket-join per
    * (band, band-hash). Returns candidate (a_id, b_id) pairs with a < b.
    *
    * Scale notes: the exploded bucket table has n_docs × bands fixed-width
    * rows; the explicit repartition on the join keys means the self-join
    * reuses that single exchange (no re-shuffle) and signature computation
    * stays below the exchange (evaluated once). Degenerate buckets (spam
    * clusters) are handled by AQE skew-join splitting; the verify stage
    * re-filters with true Jaccard.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 5, bands: Int = 8,
                        rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val buckets = sigs.select(
      col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"),
            b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")))))
      .toDF("id", "band", "band_hash")
      .repartition(col("band"), col("band_hash"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** MinHash near-dup pairs, verified: LSH candidates re-checked with exact
    * n-gram Jaccard ≥ threshold. Shingle recomputation only touches
    * candidate ids, not the corpus.
    */
  def minhashDuplicates(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 5,
                        bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleN, bands,
      rowsPerBand)
    val sh = df.select(col(idCol).cast("long").as("id"),
      TextOps.wordShingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.toDF("a_id", "a_sh"), Seq("a_id"))
      .join(sh.toDF("b_id", "b_sh"), Seq("b_id"))
      .withColumn("jaccard",
        round(TextOps.jaccard(col("a_sh"), col("b_sh")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash signatures: 64-bit, bit i = majority over token hashes' bit i.
    * Single typed pass: one tokenization, 64 counters, branch-free update.
    * Output (id: long, simhash: long).
    */
  def simhashSignatures(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val counts = new Array[Int](64)
          val toks = tokenize(text)
          var t = 0
          while (t < toks.length) {
            val h = h64(toks(t), 0)
            var i = 0
            while (i < 64) {
              counts(i) += ((h >>> i) & 1L).toInt
              i += 1
            }
            t += 1
          }
          var sig = 0L
          var i = 0
          while (i < 64) {
            if (counts(i) * 2 >= toks.length) sig |= (1L << i)
            i += 1
          }
          (id, sig)
        }
      }.toDF("id", "simhash")
  }

  /** SimHash near-dup candidates: docs whose signatures agree on at least
    * one of 4 16-bit bands (pigeonhole: Hamming ≤ 3 ⇒ some band equal).
    */
  def simhashCandidates(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val withSig = simhashSignatures(df, idCol, textCol)
    val buckets = withSig.select(col("id"), posexplode(array(
      (0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "band", "band_bits")
      .repartition(col("band"), col("band_bits"))
    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_bits") === col("b.band_bits") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold, brute force within
    * deterministic random-hyperplane LSH buckets (plane p's component for
    * dim i = ±1 by xxhash64(i, p) parity — recomputable anywhere, no stored
    * centroids).
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
}
