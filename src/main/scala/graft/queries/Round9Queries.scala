package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-9 additions: the occupancy-auto-scaled SemDeDup variant — the
  * knob the r8 review flagged as the one thing that did not grow with
  * the corpus.
  */
object Round9Queries {

  def all: Seq[Q] = Seq(

    Q("d_semdedup_auto",
      "SemDeDup with the cluster count DERIVED from the corpus size " +
        "(`Dedup.semDedupAuto`): one cell per ~128 vectors, " +
        "clamp(ceil(n/128), 2, 65536) — the quadratic within-cell knob " +
        "now grows with the corpus (at sf0.01's 500 vectors this gives " +
        "4 cells; at 100 TB it rides the cap and cells stay " +
        "~occupancy-sized), the missing piece flagged by the r8 " +
        "review. The oracle derives the SAME count via a scalar " +
        "subquery LIMIT, so the auto-scaling itself is under the " +
        "exact-hash gate, not just one pinned cluster count.",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedupAuto(Tables.embeddings(s, d),
            "vec_id", "embedding", threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedupAutoSql(dim = 64, occupancy = 128,
        threshold = "0.5"))),

    Q("curate_span_scrub",
      "Cross-document span scrub — the ACTION counterpart of " +
        "d_substring_spans' detection (the C4/RefinedWeb 'remove " +
        "duplicated spans' curation rule): docs cut into non-overlapping " +
        "8-token chunks, every chunk occurring in ≥2 DISTINCT docs " +
        "removed from ALL of them (order-free — unlike C4's keep-first, " +
        "the result is independent of dataset ordering, so it replays " +
        "on any engine), text rebuilt from surviving chunks in order. " +
        "Hot-chunk discovery is one groupBy on the chunk key; the scrub " +
        "is a left-anti equi join; reassembly sorts surviving (j, " +
        "chunk) structs per doc. Output digested per the Digest rules " +
        "(chunk counts + rebuilt-text length and 40-bit signature).",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.spanScrub(Tables.documents(s, d),
            "doc_id", "text", spanTokens = 8, minDocs = 2)
          .select($"doc_id", $"n_chunks", $"n_removed",
            length($"scrubbed").cast("long").as("scrubbed_chars"),
            Digest.strSig($"scrubbed").as("scrub_sig"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks
              |  FROM documents),
              |ch AS (
              |  SELECT doc_id, u.j AS j, u.chunk AS chunk FROM (
              |    SELECT doc_id, unnest(list_transform(
              |      range(greatest(CAST(ceil(len(toks) / 8.0) AS BIGINT),
              |        1)),
              |      x -> struct_pack(j := x,
              |        chunk := array_to_string(toks[x*8+1 : x*8+8],
              |          ' ')))) AS u
              |    FROM t)),
              |hot AS (
              |  SELECT chunk FROM (SELECT DISTINCT doc_id, chunk FROM ch)
              |  GROUP BY chunk HAVING count(*) >= 2),
              |kept AS (SELECT ch.* FROM ch ANTI JOIN hot USING (chunk)),
              |reb AS (
              |  SELECT doc_id, count(*) AS n_kept,
              |    array_to_string(list(chunk ORDER BY j), ' ') AS scrubbed
              |  FROM kept GROUP BY doc_id),
              |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch
              |        GROUP BY doc_id)
              |SELECT tot.doc_id, CAST(tot.n_chunks AS BIGINT) AS n_chunks,
              |  CAST(tot.n_chunks - coalesce(reb.n_kept, 0) AS BIGINT)
              |    AS n_removed,
              |  CAST(length(coalesce(reb.scrubbed, '')) AS BIGINT)
              |    AS scrubbed_chars,
              |  ${Digest.strSigSql("coalesce(reb.scrubbed, '')")}
              |    AS scrub_sig
              |FROM tot LEFT JOIN reb USING (doc_id)
              |ORDER BY tot.doc_id""".stripMargin)),

    Q("p_shard_export",
      "Training-data EXPORT — the last mile of a 100 TB pipeline: " +
        "deterministic md5-derived shard assignment (nShards=8, " +
        "repartition-stable, no RNG — any engine replays it), corpus " +
        "written partitionBy(shard) with exactly ONE file per shard " +
        "(repartition on the shard key first; asserted in-query from " +
        "the written layout), re-read FROM DISK and audited per shard: " +
        "doc count, doc_id sum, whitespace-token sum. The oracle " +
        "derives the identical audit closed-form, so the write → " +
        "at-rest layout → read-back loop rides the exact-hash gate " +
        "like the IVF at-rest and h5mu sinks.",
      (s, d) => {
        import s.implicits._
        Scratch.withTempDir("graft-shard-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/shards"
          val nShards = 8
          Tables.documents(s, d)
            // shard key = the proven cross-engine 40-bit md5 signature
            .withColumn("shard",
              pmod(Digest.strSig($"doc_id"), lit(nShards.toLong)))
            .repartition($"shard")
            .write.partitionBy("shard").parquet(p)
          // every WRITTEN shard must be exactly one file (repartition on
          // the shard key ⇒ one partition per shard); a legitimately
          // empty shard writes no dir and is fine. Listed via the Hadoop
          // FileSystem API so the same audit runs on HDFS/S3, not just a
          // local FS.
          val filesOk = Scratch.partitionDirs(s, p, "shard=")
            .forall(_._2 == 1)
          s.read.parquet(p)
            .groupBy($"shard".cast("long").as("shard"))
            .agg(count(lit(1)).as("n_docs"),
              sum($"doc_id").as("id_sum"),
              sum(size(split(trim($"text"), "\\s+"))).cast("long")
                .as("tok_sum"))
            .withColumn("one_file_per_shard", lit(filesOk))
            .orderBy($"shard")
        }
      },
      Some(s"""WITH s AS (
              |  SELECT *, ${Digest.strSigSql("doc_id")} % 8 AS shard
              |  FROM documents)
              |SELECT shard, count(*) AS n_docs,
              |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
              |  CAST(sum(len(string_split_regex(trim(text), '\\s+')))
              |    AS BIGINT) AS tok_sum,
              |  TRUE AS one_file_per_shard
              |FROM s GROUP BY shard ORDER BY shard""".stripMargin)),

    Q("e_knn_ivf_append",
      "Incremental ANN index MAINTENANCE — the e_knn_ivf_at_rest layout " +
        "kept alive without a rebuild (the ANN analogue of the band " +
        "index's d_incremental_index_append): k-means centroids are " +
        "trained on the ORIGINAL corpus batch only (vec_id % 10 != 0) " +
        "and then FROZEN; the original batch is written partitioned by " +
        "cell; a later batch (vec_id % 10 = 0) is assigned to the same " +
        "frozen cells — a pure map, no retraining, cost ∝ batch — and " +
        "APPENDED as new files (asserted in-query: no existing cell " +
        "file is rewritten, row count = both batches). Probes " +
        "partition-prune the updated index (isin asserted inside " +
        "PartitionFilters) and see old and new vectors in one ranked " +
        "result; the oracle replays training-on-A + assign-all in " +
        "closed form, so index maintenance is invisible to results.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val batchA = emb.filter($"vec_id" % 10 =!= 0)
        val batchB = emb.filter($"vec_id" % 10 === 0)
        val cents = graft.similarity.Knn.kmeansCentroids(
          batchA, "vec_id", "embedding", k = 16)
        // explicit-width keyed repartition before the dynamic write:
        // the single-file scan otherwise funnels assign+write through
        // ONE task (r18); keyed by cell, so files-per-cell audits see
        // the same one-file-per-cell-per-write layout. Width is
        // DATA-SCALED and capped at the cell count (r19 — a 16-cell
        // keyed repartition can never fill more than 16 tasks).
        def assigned(df: org.apache.spark.sql.DataFrame) =
          df.select($"vec_id", $"embedding",
            graft.functions.vector.vec_argmax_cosine($"embedding", cents)
              .as("cell"))
            .repartition(
              graft.ops.Width.scaled(df, 128L << 10, cents.length),
              $"cell")
        // degenerate corpus: nothing to index — empty ranked result
        // (matches the oracle on empty tables)
        if (cents.length < 2)
          Seq.empty[(Long, Long, Long)]
            .toDF("query_id", "neighbor_id", "rank")
        else Scratch.withTempDir("graft-ivfappend-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/index"
          assigned(batchA).write.partitionBy("cell").parquet(p)
          // Hadoop FileSystem listing, so the append-only audit is
          // collectible on HDFS/S3 as well as a local FS
          def cellFiles: Map[String, Int] =
            Scratch.partitionDirs(s, p, "cell=")
          val before = cellFiles
          assigned(batchB).write.mode("append")
            .partitionBy("cell").parquet(p)
          val after = cellFiles
          // append-only maintenance: every pre-existing cell keeps at
          // least its old files; nothing was rewritten away
          require(before.forall { case (c, n) => after.getOrElse(c, 0) >= n },
            s"append rewrote existing cell files: before=$before after=$after")
          val total = s.read.parquet(p).count()
          require(total == emb.count(),
            s"index lost rows: $total after append")
          // shared probe/score/rank + PartitionFilters assertion
          graft.similarity.Knn.atRestProbeTopK(s, p, cents,
            emb.filter($"vec_id" < 10), "vec_id", "embedding",
            k = 5, nProbe = 3)
        }
      },
      Some(OracleGen.knnIvfKmeansTrainedOnSql(dim = 64, nCells = 16,
        nProbe = 3, k = 5, maxQueryId = 10,
        trainWhere = "WHERE vec_id % 10 <> 0"))),

    Q("agg_sketch_merge",
      "Mergeable distinct-count summaries AT REST — the warehouse " +
        "pattern where per-partition HLL sketches are PRECOMPUTED and " +
        "stored, and later queries merge the stored sketch bytes " +
        "without rescanning the raw data: one DataSketches HLL sketch " +
        "per event shard written to parquet (stage 1), then the global " +
        "estimate computed by hll_union_agg over the 16 stored sketch " +
        "rows only (stage 2 — input is 16 rows regardless of corpus " +
        "size; at 100 TB this is the difference between a metadata " +
        "query and a full scan). Gated like the other sketch ops: the " +
        "estimate must land within the ±10% envelope of the exact " +
        "distinct count, which the oracle computes in closed form.",
      (s, d) => {
        import s.implicits._
        Scratch.withTempDir("graft-sketch-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/sketches"
          val ev = Tables.events(s, d).filter($"event_id".isNotNull)
          ev.groupBy(pmod($"event_id", lit(16L)).as("shard"))
            .agg(hll_sketch_agg($"user_id").as("sk"))
            .write.parquet(p)
          val est = s.read.parquet(p)
            .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
              count(lit(1)).as("n_shards"))
          val exact = ev.agg(
            countDistinct($"user_id").as("n_exact"))
          est.crossJoin(exact)
            .select($"n_shards",
              $"n_exact".cast("long").as("n_exact"),
              ($"est" >= $"n_exact" * 0.9 &&
                $"est" <= $"n_exact" * 1.1).as("within_10pct"))
        }
      },
      Some("""SELECT
             |  (SELECT CAST(count(DISTINCT ((event_id % 16) + 16) % 16)
             |     AS BIGINT)
             |   FROM events WHERE event_id IS NOT NULL) AS n_shards,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |  TRUE AS within_10pct
             |FROM events WHERE event_id IS NOT NULL""".stripMargin)),
  )
}
