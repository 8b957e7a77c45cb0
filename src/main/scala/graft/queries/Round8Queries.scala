package graft.queries

import graft.Tables
import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

/** Round-8 additions: the n-gram-blocked fuzzy join promised by j9's
  * scaladoc, k-means-seeded IVF, and band-index lifecycle ops. */
object Round8Queries {

  def all: Seq[Q] = Seq(

    Q("j9b_fuzzy_blocked",
      "Scale path of j9 (J-3 edit-distance alias matching, " +
        "bin/concatenate.py:74-81): identical fuzzy-join result via " +
        "`FuzzyJoin.selfJoin` — q-gram blocking for long keys + a " +
        "length-window equi join for the short residue, exact " +
        "levenshtein recheck on deduplicated candidates only. The plan " +
        "is asserted free of BroadcastNestedLoopJoin: every join is an " +
        "equi join, so the O(n²) DP kernel of the theta-join form never " +
        "materializes at corpus scale.",
      (s, d) => {
        import s.implicits._
        val out = FuzzyJoin.selfJoin(
            Tables.nation(s, d).select($"n_name"), "n_name", k = 5)
          .orderBy($"name_a", $"name_b")
        val plan = out.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        require(!plan.contains("BroadcastNestedLoopJoin"),
          "blocked fuzzy join must not plan a nested loop; got:\n" +
            plan.take(3000))
        out
      },
      // same oracle as j9 — the blocked operator must reproduce the
      // exact theta-join result
      Some("""SELECT a.n_name AS name_a, b.n_name AS name_b,
             |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
             |FROM nation a JOIN nation b
             |  ON a.n_name < b.n_name
             |  AND levenshtein(a.n_name, b.n_name) <= 5
             |ORDER BY name_a, name_b""".stripMargin)),

    Q("e_knn_ivf_kmeans",
      "IVF seeded by 2-pass Lloyd k-means centroids " +
        "(`Knn.kmeansCentroids`, the e_kmeans_lloyd recipe at " +
        "nCells=16) instead of the raw md5 sample: data-adaptive cell " +
        "centers balance occupancy (spread evidence in KnnSpec), which " +
        "caps per-probe candidate counts — the serving-latency lever at " +
        "corpus scale. Same probe/score stage as e_knn_ivf; every stage " +
        "(seed order, 6-dp centroid means, argmax assignment, ranking) " +
        "is deterministic, so the composition replays hash-exact in " +
        "DuckDB.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cents = graft.similarity.Knn.kmeansCentroids(
          emb, "vec_id", "embedding", k = 16)
        graft.similarity.Knn.ivfTopKWithCentroids(emb,
            emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 5,
            centroids = cents, nProbe = 3, logOccupancy = true)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnIvfKmeansSql(dim = 64, nCells = 16, nProbe = 3,
        k = 5, maxQueryId = 10))),

    Q("d_index_compact",
      "Band-index lifecycle, closed: d_incremental_index_append grows " +
        "one file per band per batch forever — `Dedup.compactBandIndex` " +
        "rewrites each band partition to a single band_hash-sorted file " +
        "and applies the retention predicate (here: day-0 corpus " +
        "entries expire, batch days 1-2 are live) in the same pass. " +
        "Three appended generations are compacted to 1 file per band " +
        "(asserted in the compacted_ok column), then a day-3 batch " +
        "probes the compacted index; the oracle replays the retained " +
        "union relationally, so the rewrite provably lost and invented " +
        "nothing.",
      (s, d) => {
        import s.implicits._
        Scratch.withTempDir("graft-idxcompact-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/band_index"
          val docs = Tables.documents(s, d)
          def buckets(f: org.apache.spark.sql.DataFrame, day: Int) =
            graft.dedup.Dedup.minhashBucketsPortable(f, "doc_id", "text",
              shingleN = 5, bands = 8, rowsPerBand = 2)
              .withColumn("day", lit(day.toLong))
          buckets(docs.filter($"doc_id" % 10 =!= 0), 0)
            .write.partitionBy("band").parquet(p)
          buckets(docs.filter($"doc_id" % 20 === 0), 1)
            .write.mode("append").partitionBy("band").parquet(p)
          buckets(docs.filter($"doc_id" % 20 === 10), 2)
            .write.mode("append").partitionBy("band").parquet(p)
          // Hadoop-FS listing (not java.io.File) so the audit holds on
          // HDFS/S3 index paths too
          def filesInBand0: Long = Scratch.dataFiles(s, s"$p/band=0")
          val nBefore = filesInBand0
          graft.dedup.Dedup.compactBandIndex(s, p,
            retain = col("day") >= 1L)
          val nAfter = filesInBand0
          val idx = s.read.parquet(p)
            .select($"id".as("idx_id"), $"band", $"band_hash")
          val probe = docs.filter($"doc_id" % 20 === 5)
          val matches = graft.dedup.Dedup.minhashBucketsPortable(probe,
              "doc_id", "text", shingleN = 5, bands = 8, rowsPerBand = 2)
            .join(idx, Seq("band", "band_hash"))
            .select($"id".as("doc_id"), $"idx_id").distinct()
            .groupBy($"doc_id").agg(count(lit(1)).as("c"))
          probe.select($"doc_id").distinct()
            .join(matches, Seq("doc_id"), "left")
            .select($"doc_id", coalesce($"c", lit(0L)).as("n_matches"),
              lit(nBefore >= 3L && nAfter == 1L).as("compacted_ok"))
            .orderBy($"doc_id")
        }
      },
      Some(s"""WITH ${OracleGen.minhashBucketsCte(5, 8, 2)},
              |ix AS (SELECT doc_id, band, band_hash FROM mh_buckets
              |       WHERE doc_id % 10 = 0),
              |b3 AS (SELECT * FROM mh_buckets WHERE doc_id % 20 = 5),
              |m AS (
              |  SELECT DISTINCT b.doc_id AS doc_id, i.doc_id AS idx_id
              |  FROM b3 b JOIN ix i
              |    ON b.band = i.band AND b.band_hash = i.band_hash),
              |cnt AS (SELECT doc_id, count(*) AS c FROM m GROUP BY doc_id)
              |SELECT d.doc_id,
              |  CAST(coalesce(c, 0) AS BIGINT) AS n_matches,
              |  TRUE AS compacted_ok
              |FROM (SELECT DISTINCT doc_id FROM documents
              |      WHERE doc_id % 20 = 5) d
              |LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("e_knn_pq",
      "Product-quantization ANN (Jégou et al. 2011, TPAMI): 64-dim " +
        "float32 vectors encoded to 8 one-byte subspace codes (32× " +
        "compression) against Lloyd-refined md5-sample codebooks " +
        "(one deterministic refinement pass, 6-dp means); scoring is " +
        "asymmetric " +
        "distance computation — the query precomputes one 64-entry dot " +
        "table per subspace on the broadcast side and each corpus " +
        "candidate costs 8 array lookups + adds. The float vectors never " +
        "ride the corpus-wide join: this is the memory-footprint tier " +
        "below sq8 (4×), and at rest the code columns ARE the index. " +
        "Encode argmin, table build and ADC sums are all sequential-" +
        "double kernels, so the approximate ranking replays hash-exact " +
        "in DuckDB.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.pqTopK(emb, emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5, m = 8, ksub = 64)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"), $"approx_dot")
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnPqSql(dim = 64, m = 8, ksub = 64, k = 5,
        maxQueryId = 10))),

    Q("e_knn_pq_rerank",
      "Two-stage PQ serving shape: ADC candidate generation over the " +
        "32×-compressed codes (candidates=20 per query), exact " +
        "full-precision cosine re-rank of the short list only — the " +
        "production retrieval pattern where the uncompressed vectors are " +
        "touched for ≤20 rows per query instead of the whole corpus. " +
        "Deterministic at both stages ⇒ exact oracle.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.pqRerankTopK(emb, emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5, candidates = 20, m = 8,
            ksub = 64)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"), $"cosine")
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnPqRerankSql(dim = 64, m = 8, ksub = 64, k = 5,
        candidates = 20, maxQueryId = 10))),

    Q("e_knn_ivfpq",
      "IVF-PQ — the production ANN index layout (FAISS IVFx,PQy shape, " +
        "raw-vector codes): k-means cells prune each query's scan to " +
        "nProbe=3 of 16 cells AND the scanned payload inside probed " +
        "cells is the 32×-compressed PQ code column — at rest the " +
        "corpus persists partitioned by cell carrying (id, codes), so " +
        "probes are partition-pruned scans of compressed data. Coarse " +
        "quantizer (deterministic 2-pass Lloyd) and ADC scoring " +
        "(Lloyd-refined codebooks, codegen'd kernels) are each " +
        "hash-exact, so the composition replays in DuckDB.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.ivfPqTopK(emb, emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5, nCells = 16, nProbe = 3,
            m = 8, ksub = 64)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"), $"approx_dot")
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnIvfPqSql(dim = 64, nCells = 16, nProbe = 3,
        m = 8, ksub = 64, k = 5, maxQueryId = 10))),

    Q("d_semdedup",
      "Semantic deduplication (SemDeDup, Abbas et al. 2023): 2-pass " +
        "Lloyd k-means clusters the embedding space (centroids are " +
        "metadata literals — assignment is a pure map, no shuffle), then " +
        "within-cluster pairwise cosine ≥ 0.5 removes every vector with " +
        "a lower-id cluster-mate above threshold (greedy min-id " +
        "canonical). The quadratic work is confined inside clusters — " +
        "the embedding-space analogue of the LSH band join; at rest the " +
        "corpus persists partitioned by cell so the self-join is " +
        "co-located. One row per vector: (vec_id, cell, kept).",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedup(Tables.embeddings(s, d),
            "vec_id", "embedding", nClusters = 16, threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedupSql(dim = 64, nClusters = 16,
        threshold = "0.5"))),

    Q("p_stratified_sample",
      "Deterministic stratified sampling for mixture construction: " +
        "per-stratum rates (en 25%, zh 50%, rest 100%) applied by " +
        "comparing md5(doc_id) lexicographically against a hex " +
        "threshold — a pure map with no RNG state, reproducible on any " +
        "md5-capable engine and stable under re-partitioning/retries " +
        "(the property `sample()` lacks: its seed is per-partition, so " +
        "a repartition changes the sample). Output is the per-stratum " +
        "audit: totals, sampled counts and an id-sum checksum.",
      (s, d) => {
        import s.implicits._
        val u = md5($"doc_id".cast("string"))
        val thresh = when($"lang" === "en", lit("4"))
          .when($"lang" === "zh", lit("8"))
          .otherwise(lit("g")) // 'g' > any hex digit: keep everything
        Tables.documents(s, d)
          .withColumn("sampled", u < thresh)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_total"),
            count(when($"sampled", 1)).as("n_sampled"),
            sum(when($"sampled", $"doc_id")).as("sampled_id_sum"))
          .orderBy($"lang")
      },
      Some("""WITH s AS (
             |  SELECT lang, doc_id,
             |    (md5(CAST(doc_id AS VARCHAR)) <
             |      CASE lang WHEN 'en' THEN '4' WHEN 'zh' THEN '8'
             |        ELSE 'g' END) AS sampled
             |  FROM documents)
             |SELECT lang, count(*) AS n_total,
             |  count(CASE WHEN sampled THEN 1 END) AS n_sampled,
             |  CAST(sum(CASE WHEN sampled THEN doc_id END) AS BIGINT)
             |    AS sampled_id_sum
             |FROM s GROUP BY lang ORDER BY lang""".stripMargin)),
  )
}
