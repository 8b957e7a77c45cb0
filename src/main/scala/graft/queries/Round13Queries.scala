package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-13 additions: NFC normalization composed into the NEAR-dup
  * pipeline — `d_exact_nfc` (r12) closed the false-negative for exact
  * dedup keys; this closes it for the minhash tier, where the raw-byte
  * shingle hashes split composed/decomposed spellings of the same
  * visible text into disjoint bucket sets. Non-ASCII fixture chars use
  * \u escapes so the composed/decomposed distinction survives editor
  * normalization (Round12Queries convention).
  */
object Round13Queries {

  def all: Seq[Q] = Seq(

    Q("d_minhash_nfc",
      "MinHash near-dup over NFC-NORMALIZED text — normalize-before-" +
        "hash composed into the near-dup tier (the d_exact_nfc " +
        "analogue): each doc under the corpus cap expands into two " +
        "variants spelling every 'e' precomposed (U+00E9) vs " +
        "decomposed (e + U+0301) plus a distinct tag token, so the " +
        "twins are near- (not exact-) duplicates that share ZERO " +
        "shingles at the byte level — every token differs — and band " +
        "together ONLY because unicode_normalize(text, NFC) (the " +
        "codegen'd native expression) is projected upstream of the " +
        "portable minhash. Full LSH + exact-Jaccard verify replays in " +
        "DuckDB over its independent nfc_normalize: two NFC " +
        "implementations feeding two md5-minhash pipelines, identical " +
        "verified pair lists, or the hash gate breaks. The negative " +
        "control (raw bytes never pair a twin) is spec-pinned in " +
        "Round13OpsSpec.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter($"doc_id" < 1000L)
          .select($"doc_id", $"text")
        val variants = docs.select(($"doc_id" * 2).as("vid"),
            concat(expr("replace(text, 'e', '\u00e9')"),
              lit(" veven")).as("raw"))
          .unionByName(docs.select(($"doc_id" * 2 + 1).as("vid"),
            concat(expr("replace(text, 'e', 'e\u0301')"),
              lit(" vodd")).as("raw")))
        val normalized = variants.select($"vid",
          graft.functions.text.unicode_normalize($"raw", "NFC")
            .as("text"))
        graft.dedup.Dedup.minhashDuplicatesPortable(normalized, "vid",
            "text", threshold = 0.3, shingleN = 3, bands = 4,
            rowsPerBand = 4)
          .orderBy($"a_id", $"b_id")
      },
      Some(OracleGen.minhashNfcSql(shingleN = 3, bands = 4,
        rowsPerBand = 4, threshold = 0.3, maxDocId = 1000L))),

    Q("d_semdedup_2level",
      "SemDeDup with TWO-LEVEL (hierarchical) cell assignment under " +
        "the exact oracle — the scale answer to the flat path's " +
        "O(n·k) assignment term (k grows with the corpus under the " +
        "occupancy derivation, so flat assignment is ~quadratic until " +
        "the 65536-cell cap; probe_semdedup_heavy measures ~20x at 8x " +
        "data): vectors argmax over clamp(ceil(sqrt(k)), 2, 256) " +
        "SUPER-centroids first, then over only the sub-centroids " +
        "whose own nearest super matches — O(n·sqrt(k)) total, the " +
        "IVF coarse-quantizer pattern applied to SemDeDup (what " +
        "production faiss deployments run). Both centroid sets come " +
        "from the shared deterministic Lloyd recipe, the sub-to-super " +
        "map rides the same fused argmax kernel, supers that win no " +
        "sub are excluded so no vector is ever dropped, and DuckDB " +
        "replays the ENTIRE two-level routing (both trainings, both " +
        "argmax tie-breaks, the within-cell prune) — the hierarchical " +
        "approximation itself is pinned cross-engine, not just its " +
        "flat baseline.",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedupHierarchical(Tables.embeddings(s, d),
            "vec_id", "embedding", threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedup2LevelSql(dim = 64, occupancy = 128,
        threshold = "0.5"))),
  )
}
