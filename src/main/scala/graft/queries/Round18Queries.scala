package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.ops.{ModelIo, TextClassifier, TextStats}
import graft.similarity.{EmbedInference, IntIvf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-18 queries: the retrieval chain over REAL inference
  * products goes scale-safe — the inferred embeddings
  * (`EmbedInference.embedDocs`, exact BIGINT) are served through an
  * integer-domain IVF index (`IntIvf`) instead of the brute
  * O(|docs|·|queries|) pair aggregation, with an in-plan recall row
  * against the brute baseline; plus the model-artifact lifecycle —
  * classifier and projection exports round-tripped through parquet
  * and inference re-run from the ON-DISK artifact under the same
  * oracles.
  */
object Round18Queries {

  private val Dim = 1024
  private val OutDim = 16
  private val NCells = 16
  private val NProbe = 4
  private val K = 5

  /** The IVF serving plan at a FIXED query set (doc_id % 101 == 0
    * bounded below `maxQ`) — the scale-probe form: the registered
    * `e_knn_embed_ivf` draws queries from the whole corpus, so on a
    * K×-scaled dir its query count grows ×K and the query×candidate
    * pair volume grows ×K² by construction (the winnow-probe
    * output-bound caveat). Serving cost at scale is per-query — this
    * form holds queries constant so the probe measures the real
    * linear terms: inference + cell assignment over the K× corpus and
    * the probed-cell candidate scan. */
  private[graft] def ivfServeFixedQueries(
      s: org.apache.spark.sql.SparkSession, d: String,
      maxQ: Long): DataFrame = {
    val (vecs, cents) = embedVecsAndCentroids(s, d)
    val qs = vecs.filter(col("doc_id") % 101 === 0 &&
      col("doc_id") < maxQ)
    IntIvf.ivfMipsTopK(vecs, qs, "doc_id", K, cents, NProbe)
  }

  /** Shared embed → dense-vector → centroid stage for the IVF-tier
    * queries: ONE localCheckpoint'd (id, vec) frame (|docs| × 16
    * longs — the r15/r16 measured-checkpoint discipline: the embed
    * chain is the expensive subtree and feeds the centroid action
    * plus both join sides) and the metadata-sized centroid sample. */
  private def embedVecsAndCentroids(
      s: org.apache.spark.sql.SparkSession, d: String)
    : (DataFrame, Seq[(Long, Array[Long])]) = {
    val emb = EmbedInference.embedDocs(
      Tables.documents(s, d), "doc_id", "text",
      EmbedInference.standInProjection(s, Dim, OutDim), Dim, OutDim)
    val vecs = IntIvf.denseVectors(emb, "doc_id").localCheckpoint()
    (vecs, IntIvf.md5Centroids(vecs, "doc_id", NCells).toSeq)
  }

  /** The IVF index replay as DuckDB CTE bodies over the `emb` chain:
    * centroid sample (smallest md5(id-as-string) wins), per-(doc,
    * centroid) exact dots, argmax cell assignment (ties → larger
    * centroid id — the greatest-over-structs order), query nProbe
    * probe set. `cdots` is MATERIALIZED: cells and qprobe both
    * consume it. */
  private def ivfChainSql: String =
    s"""cent AS MATERIALIZED (
       |  SELECT e.doc_id AS cid, e.j, e.e AS ce
       |  FROM emb e
       |  JOIN (SELECT doc_id FROM (SELECT DISTINCT doc_id FROM emb) v
       |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |        LIMIT $NCells) s USING (doc_id)),
       |cdots AS MATERIALIZED (
       |  SELECT e.doc_id, c.cid, CAST(sum(e.e * c.ce) AS BIGINT) AS dot
       |  FROM emb e JOIN cent c USING (j)
       |  GROUP BY e.doc_id, c.cid),
       |cells AS MATERIALIZED (
       |  SELECT doc_id, cid AS cell FROM (
       |    SELECT doc_id, cid, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY dot DESC, cid DESC) AS rn
       |    FROM cdots) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT doc_id AS query_id, cid AS cell FROM (
       |    SELECT doc_id, cid, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY dot DESC, cid DESC) AS rn
       |    FROM cdots WHERE doc_id % 101 = 0) x
       |  WHERE rn <= $NProbe),
       |ivfsc AS (
       |  SELECT q.query_id, cl.doc_id AS neighbor_id,
       |    CAST(sum(qe.e * ce.e) AS BIGINT) AS dot
       |  FROM qprobe q
       |  JOIN cells cl USING (cell)
       |  JOIN emb qe ON qe.doc_id = q.query_id
       |  JOIN emb ce ON ce.doc_id = cl.doc_id AND ce.j = qe.j
       |  WHERE cl.doc_id <> q.query_id
       |  GROUP BY q.query_id, cl.doc_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id, dot, CAST(rn AS BIGINT) AS rank
       |  FROM (SELECT query_id, neighbor_id, dot,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY dot DESC, neighbor_id) AS rn
       |        FROM ivfsc) t
       |  WHERE rn <= $K)""".stripMargin

  /** The gate + cross-batch-dedup replay as DuckDB CTE bodies over
    * `documents`: the e2e chain's gate stages spliced from the ONE
    * shared generator ([[OracleGen.curationGateCtes]] — the same
    * helper `curate_e2e_pipeline` uses, so the twins cannot drift),
    * survivors bucketed by the portable MinHash recipe, and `coll` =
    * survivors sharing a band with a STRICTLY-EARLIER arrival batch
    * (bid = doc_id·4 div (max_id+1) — four data-defined arrival
    * waves at every SF). */
  private def streamCurateOracleSql: String =
    s"""${OracleGen.curationGateCtes("documents", 1024)},
       |surv AS MATERIALIZED (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN gkeep USING (doc_id) JOIN rkeep USING (doc_id)
       |  JOIN ckeep USING (doc_id)),
       |nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
       |${OracleGen.minhashBucketsCte(5, 8, 2, source = "surv")},
       |bb AS MATERIALIZED (
       |  SELECT doc_id, band, band_hash, (doc_id * 4) // n AS bid
       |  FROM mh_buckets, nn),
       |coll AS (
       |  SELECT DISTINCT b.doc_id FROM bb b JOIN bb i
       |    ON b.band = i.band AND b.band_hash = i.band_hash
       |    AND i.bid < b.bid)""".stripMargin

  def all: Seq[Q] = Seq(

    Q("stream_curate_pipeline",
      "INCREMENTAL curation — the batch composite's gate + near-dup " +
        "policy as a LIVE pipeline: documents arrive in 4 " +
        "doc-id-ordered micro-batches (one-file shards, mtime-spaced " +
        "so the file source replays arrival order); each batch maps " +
        "STATELESSLY through the fused rule+classifier gate " +
        "(TextStats.curationStatsInline — the whole Gopher/" +
        "repetition/classifier pass as one per-row projection, ZERO " +
        "stateful operators, audited in-query: the executed " +
        "micro-batch gate plan must contain no Exchange); gate " +
        "survivors probe the AT-REST band index (the d_incremental_" +
        "index_append layout: parquet partitioned by band) for " +
        "collisions with STRICTLY-EARLIER batches — earliest-batch-" +
        "wins near-dup policy, the incremental twin of the batch " +
        "chain's canonical select — and every survivor's bands are " +
        "APPENDED to the index, never recomputed. Per-arrival cost: " +
        "one row's gate expressions + 8 band probes + an append " +
        "touching only arriving band partitions; no corpus access, " +
        "no retrain, state lives AT REST in the index, not in the " +
        "stream. Gate identity with curate_e2e_pipeline is " +
        "STRUCTURAL, not copied: both plans filter on the one " +
        "TextStats.curationGate column and both oracles splice the " +
        "one OracleGen.curationGateCtes generator, so completed " +
        "stream ≡ batch chain is hash-gated and drift-proof.",
      (s, d) => {
        import s.implicits._
        val docsT = Tables.documents(s, d)
        val schema = docsT.schema
        val n = docsT.agg(max($"doc_id")).head().getLong(0) + 1L
        val wmap = TextClassifier.standInWeights(s, 1024)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // fixed past epoch base: arrival order is a FILE property
        // (mtime), not a run property, so the cached shard set
        // replays identically across runs in this JVM
        val shards = Scratch.cachedDir(s"curate-shards:$d") { tmp =>
          val base = 1700000000000L
          var stamped = Set.empty[String]
          (0L until 4L).foreach { i =>
            docsT.filter(expr(s"(doc_id * 4) div $n") === i)
              .coalesce(1).write.mode("append")
              .parquet(tmp.getAbsolutePath)
            tmp.listFiles
              .filter(f => f.getName.endsWith(".parquet") &&
                !stamped(f.getName))
              .foreach { f =>
                // a silently failed stamp would reorder arrival and
                // turn an oracle mismatch opaque — fail fast instead
                // (the Round11 stream-shard precedent)
                require(f.setLastModified(base + i * 2000),
                  s"cannot stamp mtime on $f")
                stamped += f.getName
              }
          }
        }.getAbsolutePath
        val runRoot = java.nio.file.Files
          .createTempDirectory("graft-scp-").toFile
        val idxDir = s"${runRoot.getAbsolutePath}/band_index"
        val keptDir = s"${runRoot.getAbsolutePath}/kept"
        @volatile var gatePlanAudited = false
        try {
          graft.streaming.Streams.runForeachBatch(s) { scoped =>
            graft.streaming.Streams.fileStream(scoped, shards, schema,
              maxFilesPerTrigger = 1)
          } { (df, _) =>
            val sc = df.sparkSession
            // text rides THROUGH the per-row projection (keep), so
            // the survivor frame is still one map — no join back
            // onto the raw batch, no second scan
            val stats = TextStats.curationStatsInline(
              df.select(col("doc_id"), col("text")), "doc_id", "text",
              wmap, 1024, keep = Seq("text"))
            if (!gatePlanAudited) {
              // the zero-state claim, checked on the EXECUTED batch
              // plan: the fused gate is one projection, no exchange
              val p = stats.queryExecution.executedPlan.toString
              require(!p.contains("Exchange"),
                s"inline gate plan must be a pure map, got:\n$p")
              gatePlanAudited = true
            }
            // survivors feed bands + the kept write: checkpoint the
            // STATS frame (micro-batch-sized), THEN filter — checking
            // the gate on the lazy frame lets PushPredicateThroughNonJoin
            // substitute all 11 predicate trees below the projection,
            // re-evaluating the tokenize + gram sorts + hash fold ~2×
            // per row and the split ~10× (measured 1.9 s/batch vs
            // 0.45 s for one honest evaluation). The checkpoint is a
            // materialization barrier: every gate expression runs
            // exactly once per row, the filter then reads materialized
            // columns. The gate is the ONE shared
            // TextStats.curationGate definition — identical to the
            // batch composite by construction
            sc.sparkContext.setJobDescription("scp: gate checkpoint")
            // non-survivors' text is NULLed before the checkpoint
            // (r18 advice): only survivors' text is read downstream
            // (the band builder runs after the __keep filter), so the
            // barrier stops storing the full text of rows it is about
            // to drop; the gate itself is cheap comparisons over the
            // already-computed stat columns
            val surv = stats
              .select(col("doc_id"),
                when(TextStats.curationGate, col("text")).as("text"),
                col("n_words"), col("n_feats"), col("dot"),
                TextStats.curationGate.as("__keep"))
              .localCheckpoint()
              .filter(col("__keep")).drop("__keep")
            sc.sparkContext.setJobDescription("scp: own bands")
            val ownBands = Dedup.minhashBucketsPortable(surv,
                "doc_id", "text", shingleN = 5, bands = 8,
                rowsPerBand = 2)
              .withColumn("bid", expr(s"(id * 4) div $n"))
              .localCheckpoint()
            // probe set = at-rest index ∪ this batch's own bands (a
            // catch-up trigger carrying several bids still sees its
            // earlier waves); collision ⟺ shared bucket with a
            // strictly smaller bid
            val idxBands =
              if (new java.io.File(idxDir).exists)
                sc.read.parquet(idxDir)
                  .select(col("band"), col("band_hash"),
                    col("bid").as("i_bid"))
              else null
            val own = ownBands.select(col("band"), col("band_hash"),
              col("bid").as("i_bid"))
            val probe =
              if (idxBands == null) own else idxBands.union(own)
            val coll = ownBands.join(probe, Seq("band", "band_hash"))
              .filter(col("i_bid") < col("bid"))
              .select(col("id").as("doc_id")).distinct()
            sc.sparkContext.setJobDescription("scp: kept write")
            surv.select(col("doc_id"), col("n_words"), col("n_feats"),
                col("dot"))
              .join(coll, Seq("doc_id"), "left_anti")
              .write.mode("append").parquet(keptDir)
            // EVERY gate survivor's bands enter the index (kept or
            // not): the next wave must collide with whichever arrived
            // first, exactly the oracle's earlier-batch predicate.
            // Skip empty batches: a dynamic-partition write of an
            // empty frame creates the directory with ZERO data files,
            // which the next batch's read would fail to infer a
            // schema from (isEmpty on the checkpointed frame is one
            // cheap local scan)
            sc.sparkContext.setJobDescription("scp: index append")
            if (!ownBands.isEmpty)
              ownBands.select(col("id"), col("band"), col("band_hash"),
                  col("bid"))
                .write.mode("append").partitionBy("band").parquet(idxDir)
            sc.sparkContext.setJobDescription(null)
          }
          s.read.parquet(keptDir)
            .orderBy($"doc_id").localCheckpoint()
        } finally Scratch.rmTree(runRoot)
      },
      Some(s"""WITH $streamCurateOracleSql
         |SELECT s.doc_id, CAST(g.n_words AS BIGINT) AS n_words,
         |  CAST(sc.n_feats AS BIGINT) AS n_feats, sc.dot
         |FROM surv s
         |JOIN gop g USING (doc_id)
         |JOIN scored sc USING (doc_id)
         |WHERE s.doc_id NOT IN (SELECT doc_id FROM coll)
         |ORDER BY s.doc_id""".stripMargin)),

    Q("e_knn_embed_ivf",
      "The SERVING plan for retrieval over real inference products: " +
        "text -> hashed-projection embedding (m_embed_infer's exact " +
        "BIGINT vectors) -> integer-domain IVF-MIPS top-5 (IntIvf — " +
        "the FAISS IndexIVFFlat layout in exact integer arithmetic). " +
        "Retires e_knn_embed_infer's brute O(|docs|x|queries|) pair " +
        "agg as the only path over inferred embeddings: centroids = " +
        "md5-ordered 16-doc sample (metadata-sized, collected once, " +
        "inlined as literals); corpus cell assignment is a PURE MAP " +
        "(argmax over 16 exact dots, greatest-over-structs — no " +
        "join, no shuffle); queries explode x4 probes on the " +
        "broadcast side only; scoring touches ONLY the probed " +
        "cells' candidates (~nProbe/nCells of the corpus per " +
        "query). Every stage is a BIGINT sum, so the whole index is " +
        "hash-exact cross-engine — no float tolerance anywhere.",
      (s, d) => {
        import s.implicits._
        val (vecs, cents) = embedVecsAndCentroids(s, d)
        val qs = vecs.filter($"doc_id" % 101 === 0)
        IntIvf.ivfMipsTopK(vecs, qs, "doc_id", K, cents, NProbe)
          .orderBy($"query_id", $"rank")
      },
      Some(s"""WITH ${EmbedInference.embedChainSql(Dim, OutDim)},
         |$ivfChainSql
         |SELECT query_id, neighbor_id, dot, rank
         |FROM ivf ORDER BY query_id, rank""".stripMargin)),

    Q("e_embed_ivf_recall",
      "The IVF tier's recall@5 against the brute exact-MIPS " +
        "baseline, measured IN-PLAN (the e_ann_recall_eval harness " +
        "applied to the inferred-embedding chain): brute top-5 per " +
        "query (exact BIGINT dots over the same localCheckpoint'd " +
        "vectors) LEFT-joined against the IVF top-5, hits counted " +
        "in BIGINT, ONE IEEE division for the reported recall. An " +
        "engine swapping the brute tier for the IVF index must be " +
        "able to quantify what the approximation costs, and both " +
        "engines must agree on every per-query hit count exactly.",
      (s, d) => {
        import s.implicits._
        val (vecs, cents) = embedVecsAndCentroids(s, d)
        val qs = vecs.filter($"doc_id" % 101 === 0)
        val w = Window.partitionBy($"query_id")
          .orderBy($"dot".desc, $"neighbor_id")
        val brute = vecs
          .select($"doc_id".as("neighbor_id"), $"vec".as("c_vec"))
          .crossJoin(broadcast(qs.select($"doc_id".as("query_id"),
            $"vec".as("q_vec"))))
          .filter($"query_id" =!= $"neighbor_id")
          .withColumn("dot", IntIvf.dotL($"q_vec", $"c_vec"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= K)
          .select($"query_id", $"neighbor_id")
        val ivf = IntIvf.ivfMipsTopK(vecs, qs, "doc_id", K, cents,
            NProbe)
          .select($"query_id".as("iq"), $"neighbor_id".as("in"))
        brute.join(ivf,
            $"query_id" === $"iq" && $"neighbor_id" === $"in", "left")
          .groupBy($"query_id")
          .agg(count($"in").as("n_hits"))
          .select($"query_id", $"n_hits",
            ($"n_hits".cast("double") / lit(5.0)).as("recall_at_k"))
          .orderBy($"query_id")
      },
      Some(s"""WITH ${EmbedInference.embedChainSql(Dim, OutDim)},
         |$ivfChainSql,
         |bpairs AS (
         |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         |    CAST(sum(q.e * c.e) AS BIGINT) AS dot
         |  FROM (SELECT * FROM emb WHERE doc_id % 101 = 0) q
         |  JOIN emb c USING (j)
         |  WHERE c.doc_id <> q.doc_id
         |  GROUP BY q.doc_id, c.doc_id),
         |brute AS (
         |  SELECT query_id, neighbor_id
         |  FROM (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY dot DESC, neighbor_id) AS rn
         |        FROM bpairs) t
         |  WHERE rn <= $K)
         |SELECT b.query_id,
         |  CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
         |  CAST(count(i.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_k
         |FROM brute b LEFT JOIN ivf i
         |  ON b.query_id = i.query_id
         |    AND b.neighbor_id = i.neighbor_id
         |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin)),

    Q("m_classifier_from_disk",
      "The model-artifact lifecycle, proven instead of asserted: the " +
        "classifier's quantized integer export is WRITTEN to parquet " +
        "(ModelIo.exportModel — one metadata-sized file, the " +
        "broadcastability invariant) and inference re-runs from the " +
        "LOADED frame under curate_classifier_score's exact oracle — " +
        "fixed-point BIGINT weights survive parquet bit-for-bit, so " +
        "the on-disk round trip is hash-identical to the in-memory " +
        "model, and scoreDocs' full-coverage guard now audits the " +
        "ARTIFACT (a sparse/duplicated export fails loudly at " +
        "load-and-serve, spec-pinned in Round18OpsSpec). A trained " +
        "fastText-style export drops into exactly this path.",
      (s, d) => {
        import s.implicits._
        val path = ModelIo.tmpModelDir("clf_w1024")
        ModelIo.exportModel(TextClassifier.standInWeights(s, 1024),
          path)
        TextClassifier.scoreDocs(
            Tables.documents(s, d).select($"doc_id", $"text"),
            "doc_id", "text", ModelIo.loadModel(s, path), dim = 1024,
            thrNum = 5L, thrDen = 1000L)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${Round16Queries.scoredSql(1024)}
         |SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats, dot,
         |  CAST(dot AS DOUBLE) / CAST(n_feats AS DOUBLE) AS score,
         |  (1000 * dot >= 5 * n_feats) AS keep
         |FROM scored ORDER BY doc_id""".stripMargin)),

    Q("m_embed_from_disk",
      "Classifier-GATED embedding with BOTH models served from " +
        "on-disk parquet artifacts — the trained-export serving " +
        "composition a curation+retrieval deployment actually runs: " +
        "score every doc from the loaded classifier export, keep " +
        "logit >= 5/1000 (cross-multiplied BIGINT), then embed ONLY " +
        "the survivors from the loaded projection export. Plan: " +
        "pass 1 tokenizes the full corpus for the gate (explode -> " +
        "broadcast weight join -> one doc-keyed partial agg); the " +
        "survivor id set semi-joins the corpus and pass 2 tokenizes " +
        "survivors only — deliberately re-tokenizing rather than " +
        "materializing the ~2-rows-per-token feature stream between " +
        "passes (at 100 TB the token stream dwarfs the corpus; the " +
        "doc-sized survivor set is the right thing to persist). " +
        "Output is the m_embed_infer long form over kept docs, " +
        "doc_id % 5 == 0 sample on the output side only.",
      (s, d) => {
        import s.implicits._
        val clfPath = ModelIo.tmpModelDir("clf_w1024")
        val projPath = ModelIo.tmpModelDir("proj_w1024x16")
        ModelIo.exportModel(TextClassifier.standInWeights(s, 1024),
          clfPath)
        ModelIo.exportModel(
          EmbedInference.standInProjection(s, 1024, 16), projPath)
        val docs = Tables.documents(s, d).select($"doc_id", $"text")
        val kept = TextClassifier.scoreDocs(docs, "doc_id", "text",
            ModelIo.loadModel(s, clfPath), dim = 1024,
            thrNum = 5L, thrDen = 1000L)
          .filter($"keep").select($"doc_id")
        val emb = EmbedInference.embedDocs(docs.join(kept, "doc_id"),
          "doc_id", "text", ModelIo.loadModel(s, projPath), 1024, 16)
        emb.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"j", $"e")
          .orderBy($"doc_id", $"j")
      },
      Some(s"""WITH toks AS (
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
         |h AS MATERIALIZED (
         |  SELECT doc_id,
         |    ${TextClassifier.featureHashSql("feat", 1024)} AS fid
         |  FROM feats),
         |wc AS (${TextClassifier.standInWeightsSql(1024)}),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_feats,
         |    CAST(sum(wgt) AS BIGINT) AS dot
         |  FROM h JOIN wc USING (fid)
         |  GROUP BY doc_id),
         |kept AS (SELECT doc_id FROM scored
         |  WHERE 1000 * dot >= 5 * n_feats),
         |wp AS (${EmbedInference.standInProjectionSql(1024, 16)})
         |SELECT doc_id, j, CAST(sum(wgt) AS BIGINT) AS e
         |FROM h
         |JOIN kept USING (doc_id)
         |JOIN wp USING (fid)
         |WHERE doc_id % 5 = 0
         |GROUP BY doc_id, j
         |ORDER BY doc_id, j""".stripMargin)),
  )
}
