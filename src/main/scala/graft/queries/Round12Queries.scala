package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-12 additions: the LSH hot-bucket cap under the hash gate, and
  * NFC normalization composed into an actual dedup key.
  */
object Round12Queries {

  /** Planted spam text: 30 distinct lowercase tokens, identical across
    * all spam docs, so every spam doc lands in the SAME bucket in every
    * band — the degenerate hot bucket the cap exists for. Shared with
    * the oracle as a literal.
    */
  private[queries] val spamText: String =
    (0 until 30).map(i => s"spamtok$i").mkString(" ")

  /** documents ∪ the 120-doc spam fleet — ONE fixture builder shared by
    * `d_lsh_bucket_cap` and `d_lsh_bucket_stats` so the two gated
    * queries exercise the identical planted wall by construction
    * (mirrored in SQL by `OracleGen.spamSrcCtes`).
    */
  private def spamDocs(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select($"doc_id", $"text")
      .unionByName(s.range(0L, 120L).select(
        (lit(10000000L) + $"id").as("doc_id"),
        lit(spamText).as("text")))
  }

  def all: Seq[Q] = Seq(

    Q("d_lsh_bucket_cap",
      "LSH hot-bucket cap under the exact oracle — the scale guard that " +
        "bounds what AQE cannot: a spam cluster of k docs in one band " +
        "bucket emits O(k²) candidate pairs, and skew-join splitting " +
        "redistributes that join without shrinking its OUTPUT. The corpus " +
        "is documents plus 120 planted identical-text docs (one " +
        "degenerate bucket in every band); the cap is derived from the " +
        "corpus count (Dedup.bucketCap = max(64, 8·bitlen(n+1)), " +
        "integer-exact on both engines via length(bin())), buckets over " +
        "it STAR-reduce to their min-id hub (k−1 pairs, components " +
        "preserved exactly), buckets under it emit the normal clique. " +
        "Per-doc candidate degree AND the derived cap itself ride the " +
        "hash gate, so the derivation and the reduction are both pinned: " +
        "the spam hub shows degree 119, members degree 1, and the " +
        "natural corpus (max observed bucket 7 at sf0.1 vs cap 104) is " +
        "untouched.",
      (s, d) => {
        import s.implicits._
        val docs = spamDocs(s, d)
        // maxBucket = 0 → the cap derives IN-PLAN inside the candidate
        // generator; the same formula is re-derived here as a broadcast
        // scalar so the cap VALUE rides the hash gate as a column —
        // nothing executes at construction time
        val capRow = docs.agg(count(lit(1)).as("n")).select(
          greatest(lit(64L),
            (lit(8L) * length(bin($"n" + 1))).cast("long")).as("cap"))
        val cands = graft.dedup.Dedup.minhashCandidatesPortable(
          docs, "doc_id", "text", shingleN = 3, bands = 8,
          rowsPerBand = 2, maxBucket = 0)
        val deg = cands.select($"a_id".as("doc_id"))
          .union(cands.select($"b_id".as("doc_id")))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_candidates"))
        docs.select($"doc_id").join(deg, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_candidates"))
          .crossJoin(broadcast(capRow))
          .orderBy($"doc_id")
      },
      Some(OracleGen.lshBucketCapSql(shingleN = 3, bands = 8,
        rowsPerBand = 2, nSpam = 120, spamText = spamText))),

    Q("d_lsh_bucket_stats",
      "LSH bucket-health MONITORING under the hash gate — the " +
        "'no silent truncation' surface of the hot-bucket cap as a " +
        "first-class rollup: per band, the bucket count, the largest " +
        "bucket, how many buckets exceed the corpus-derived cap " +
        "(Dedup.lshBucketStats with the same in-plan broadcast-scalar " +
        "derivation the capped generators use), and the cap itself. " +
        "Over documents plus the 120-doc spam fleet every band reports " +
        "EXACTLY one capped bucket (the planted wall) — the alert a " +
        "100 TB pipeline pages on when a spam campaign or a degenerate " +
        "tokenizer floods a band. One groupBy + one tiny rollup; " +
        "nothing quadratic anywhere.",
      (s, d) => {
        import s.implicits._
        val docs = spamDocs(s, d)
        val buckets = graft.dedup.Dedup.minhashBucketsPortable(
          docs, "doc_id", "text", shingleN = 3, bands = 8,
          rowsPerBand = 2)
        graft.dedup.Dedup
          .lshBucketStats(buckets, capFrom = docs.select($"doc_id"))
          .groupBy($"band".cast("long").as("band"))
          .agg(count(lit(1)).as("n_buckets"),
            max($"bkt_n").as("max_bucket"),
            sum(when($"capped", 1L).otherwise(0L)).as("n_capped"),
            max($"bkt_cap").as("cap"))
          .orderBy($"band")
      },
      Some(OracleGen.lshBucketStatsSql(shingleN = 3, bands = 8,
        rowsPerBand = 2, nSpam = 120, spamText = spamText))),

    Q("d_simhash_adaptive",
      "CORPUS-ADAPTIVE simhash banding under the exact oracle — the " +
        "r12 redesign that replaced the fixed 4x16-bit bands (whose " +
        "2^16 key space fills with unrelated docs at corpus scale) " +
        "with phashBandMasks composite bands: m signature blocks, " +
        "bands = all (m-t)-subsets as single bit-masks, recall-exact " +
        "by pigeonhole for Hamming <= 3 at every corpus size. The " +
        "corpus slice is FIXED (doc_id < 400, dense ids, so n = 400 " +
        "at every SF) which makes the derived layout a constant the " +
        "oracle embeds as literal masks (m = 5 blocks of 12 bits over " +
        "the 60-bit md5 simhash, C(5,2) = 10 bands of 24 bits): a " +
        "pair is a candidate iff its oracle-exact signatures agree on " +
        "every bit of some mask, reported with its exact Hamming " +
        "distance. Spark derives the same layout from its runtime " +
        "corpus count, so the derivation AND the band-collision " +
        "semantics both ride the hash gate. Banding uncapped here by " +
        "explicit maxBucket (this query pins BANDING; the cap " +
        "machinery is pinned by d_lsh_bucket_cap/d_lsh_bucket_stats).",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter($"doc_id" < 400L)
        // ONE signature pass (checkpointed) feeds both the band
        // explode and the two Hamming-join sides — the per-token
        // hashing is the expensive pass at corpus scale
        val sigs = graft.dedup.Dedup.simhashSignatures(docs,
          "doc_id", "text", tokenHash = "md5").localCheckpoint()
        val cands = graft.dedup.Dedup.simhashCandidatesFromSigs(sigs,
          nDocs = 400L, maxHamming = 3, hashBits = 60,
          maxBucket = Int.MaxValue)
        cands
          .join(sigs.toDF("a_id", "sa"), "a_id")
          .join(sigs.toDF("b_id", "sb"), "b_id")
          .select($"a_id", $"b_id",
            bit_count($"sa".bitwiseXOR($"sb")).cast("long")
              .as("hamming"))
          .orderBy($"a_id", $"b_id")
      },
      Some(OracleGen.simhashAdaptiveSql(maxDocId = 400L,
        maxHamming = 3))),

    Q("d_exact_nfc",
      "Exact dedup over NFC-NORMALIZED keys — unicode_normalize finally " +
        "doing the job it was built for (normalize-before-hash): web " +
        "text carries the same visible string both precomposed " +
        "(U+00E9 é) and decomposed (e + U+0301), and a byte-level " +
        "digest key splits those into different documents. Each doc is " +
        "expanded into TWO variants whose tails spell caf-e-acute the two " +
        "ways; Dedup.exactNormalized groups on " +
        "md5(unicode_normalize(text, NFC)) — the codegen'd native " +
        "expression, all-ASCII rows returning their input buffer " +
        "untouched — so every variant pair collapses to one group " +
        "(n_copies = 2, keep = the even id). The oracle replays with " +
        "DuckDB's independent nfc_normalize: two NFC implementations, " +
        "identical digests, or the hash gate breaks. Without " +
        "normalization the same corpus yields zero groups of 2 " +
        "(spec-pinned in Round12OpsSpec).",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).select($"doc_id", $"text")
        val variants = docs.select(($"doc_id" * 2).as("vid"),
            concat($"text", lit(" caf\u00e9")).as("raw"))
          .unionByName(docs.select(($"doc_id" * 2 + 1).as("vid"),
            concat($"text", lit(" cafe\u0301")).as("raw")))
        graft.dedup.Dedup.exactNormalized(variants, "raw", "vid")
          .orderBy($"content_hash")
      },
      Some("""WITH v AS (
             |  SELECT doc_id * 2 AS vid, text || ' caf' || chr(233) AS raw
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id * 2 + 1, text || ' cafe' || chr(769)
             |  FROM documents)
             |SELECT md5(nfc_normalize(raw)) AS content_hash,
             |  CAST(min(vid) AS BIGINT) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM v GROUP BY md5(nfc_normalize(raw))
             |ORDER BY content_hash""".stripMargin)),
  )
}
