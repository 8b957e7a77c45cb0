package graft.queries

import graft.Tables
import graft.text.Bpe
import org.apache.spark.sql.functions._

/** Round-18 wave 2: the real BPE tokenizer (VERDICT r17 item 4) and the
  * uncapped e2e curation audit (item 7). */
object Round18bQueries {

  def all: Seq[Q] = Seq(

    Q("curate_e2e_uncapped",
      "The UNCAPPED curation chain oracle-gated (the capped " +
        "curate_e2e_pipeline hash-gates stage VALUES under a " +
        "doc-id cap that keeps the recursive-CTE replay tractable; " +
        "this audit runs the PRODUCTION shape — no cap — and gates " +
        "it on stage-count invariants instead of the recursive " +
        "replay): per-stage counts for the LINEAR stages (input/" +
        "eval split, fused-gate survivors, line-dedup survivors, " +
        "band singletons = cleaned docs sharing no LSH bucket) are " +
        "hash-checked against a NON-RECURSIVE DuckDB replay spliced " +
        "from the SAME e2ePrefixSql/curationGateCtes generators as " +
        "the capped twin, and the recursive stages (CC canonical " +
        "select, split, pack) are gated by ENGINE-COMPUTED " +
        "invariant bits the oracle pins to 1 — a violated " +
        "invariant (canonical set larger than cleaned, a " +
        "band-singleton not canonical, split rows != finalists, " +
        "packed tokens != finalist tokens) flips the bit and " +
        "hash-fails the row. Value exactness of the recursive " +
        "stages stays proven on the capped twin; THIS query proves " +
        "the uncapped plan runs those stages consistently at full " +
        "corpus size.",
      (s, d) => {
        import s.implicits._
        val st = Round17Queries.e2eStages(s, Tables.documents(s, d),
          maxDocId = None)
        val nInput = st.base.count()
        val nEval = st.evalD.count()
        val nGate = st.keep.count()
        val nClean = st.cleanD.count()
        // endpoint union of the candidate pairs = every doc sharing
        // a band bucket with another doc (identical however the
        // pair set is thinned — hub-star or all-pairs)
        val collided = st.edges.select($"a_id".as("doc_id"))
          .union(st.edges.select($"b_id".as("doc_id"))).distinct()
          .localCheckpoint()
        val nCollided = collided.count()
        val nCanon = st.canon.count()
        val singletonNotCanon = st.cleanD.select($"doc_id")
          .join(collided, Seq("doc_id"), "left_anti")
          .join(st.canon.select($"doc_id"), Seq("doc_id"), "left_anti")
          .count()
        val nFin = st.fin.count()
        // coalesce: sum over ZERO rows is NULL — an all-filtered
        // corpus must report 0s and flip invariant bits, not NPE
        val packRow = st.packed
          .agg(coalesce(sum($"n_docs"), lit(0L)).as("d"),
            coalesce(sum($"sum_toks"), lit(0L)).as("t")).head()
        val (packDocs, packToks) =
          (packRow.getLong(0), packRow.getLong(1))
        val finToks = st.fin
          .select(size(split($"text", "\\s+")).cast("long").as("t"))
          .agg(coalesce(sum($"t"), lit(0L))).head().getLong(0)
        def bit(ok: Boolean) = if (ok) 1L else 0L
        Seq(
          "band_singleton" -> (nClean - nCollided),
          "clean_surv" -> nClean,
          "eval" -> nEval,
          "gate_surv" -> nGate,
          "input" -> nInput,
          "inv_canon_le_clean" -> bit(nCanon <= nClean),
          "inv_pack_conserves_toks" -> bit(packToks == finToks),
          "inv_singletons_canonical" -> bit(singletonNotCanon == 0L),
          "inv_split_partition" -> bit(packDocs == nFin)
        ).toDF("stage", "n").orderBy($"stage")
      },
      Some(s"""WITH ${Round17Queries.e2ePrefixSql(cap = None)},
         |${OracleGen.minhashBucketsCte(5, 8, 2, source = "cleand")},
         |coll AS (SELECT a_id AS doc_id FROM mh_cand
         |  UNION SELECT b_id FROM mh_cand)
         |SELECT stage, n FROM (
         |  SELECT 'input' AS stage,
         |    (SELECT CAST(count(*) AS BIGINT) FROM base) AS n
         |  UNION ALL SELECT 'eval',
         |    (SELECT CAST(count(*) AS BIGINT) FROM evald)
         |  UNION ALL SELECT 'gate_surv',
         |    (SELECT CAST(count(*) AS BIGINT) FROM surv)
         |  UNION ALL SELECT 'clean_surv',
         |    (SELECT CAST(count(*) AS BIGINT) FROM cleand)
         |  UNION ALL SELECT 'band_singleton',
         |    (SELECT CAST(count(*) AS BIGINT) FROM cleand) -
         |    (SELECT CAST(count(*) AS BIGINT) FROM coll)
         |  UNION ALL SELECT 'inv_canon_le_clean', CAST(1 AS BIGINT)
         |  UNION ALL SELECT 'inv_pack_conserves_toks',
         |    CAST(1 AS BIGINT)
         |  UNION ALL SELECT 'inv_singletons_canonical',
         |    CAST(1 AS BIGINT)
         |  UNION ALL SELECT 'inv_split_partition', CAST(1 AS BIGINT)
         |) t ORDER BY stage""".stripMargin)),

    Q("t_bpe_real",
      "TRUE byte-pair encoding over a pinned 32-rule merge table (not " +
        "the t_token_bpe punctuation estimate): whitespace " +
        "pre-tokenization, [a-z]+ words merged by rank-ordered greedy " +
        "LTR passes (proved ≡ min-rank iterative BPE under the table " +
        "invariant Bpe.validateTable enforces; spec-pinned vs a literal " +
        "JVM min-rank reference), other words 1 fallback token each. " +
        "Engine and oracle are generated from the SAME table as " +
        "identical non-regex replace chains (Spark UTF8String.replace " +
        "and DuckDB replace share LTR-resume-after-match semantics), so " +
        "the count is hash-exact. Plan: one codegen'd projection — no " +
        "UDF, no shuffle, merge table shipped inside the expression " +
        "tree; embarrassingly parallel at 100 TB.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"lang",
            Bpe.tokenCount($"text").as("n_bpe"),
            graft.text.TextOps.tokenCount($"text").as("n_ws"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH words AS (
         |  SELECT doc_id, u.w AS w
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(text), '\\s+') AS ws
         |        FROM documents WHERE text IS NOT NULL) t,
         |    unnest(ws) AS u(w)
         |  WHERE len(w) > 0),
         |perdoc AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN regexp_matches(w, '^[a-z]+$$')
         |      THEN ${Bpe.wordCountSql("w")}
         |      ELSE 1 END) AS BIGINT) AS n_bpe,
         |    CAST(count(*) AS BIGINT) AS n_ws
         |  FROM words GROUP BY doc_id)
         |SELECT d.doc_id, d.lang,
         |  CASE WHEN d.text IS NULL THEN NULL
         |    ELSE coalesce(p.n_bpe, 0) END AS n_bpe,
         |  CASE WHEN d.text IS NULL THEN NULL
         |    ELSE coalesce(p.n_ws, 0) END AS n_ws
         |FROM documents d LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin))
  )
}
