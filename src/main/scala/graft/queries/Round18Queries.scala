package graft.queries

import graft.Tables
import graft.ops.{ModelIo, TextClassifier}
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

  def all: Seq[Q] = Seq(

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
