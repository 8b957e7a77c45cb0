package graft.queries

import graft.Tables
import graft.ops.{Relational, Sampling}
import org.apache.spark.sql.functions._

/** Round-15 third wave: weighted sampling (priority sampling — the
  * weighted counterpart of `p_bottomk_sample`), sketch-based join
  * cardinality estimation (KMV threshold estimator), a distributed 2-D
  * skyline (Pareto frontier without a global sort), and MMR result
  * diversification (the answer-de-duplication layer over the ANN
  * serving paths).
  */
object Round15cQueries {

  /** The 44-bit fixed-point scale as SQL literals, derived from the
    * single Scala-side constant so the engines cannot diverge (the
    * mmrSql lambda-literal discipline). The double form is exact —
    * 2^44 is a power of two. */
  private val ScaleL = Sampling.PriorityScale.toString
  private val ScaleD = s"$ScaleL.0"

  def all: Seq[Q] = Seq(

    Q("p_priority_sample",
      "Priority sampling (Duffield-Lund-Thorup JACM 2007): weighted " +
        "sampling WITHOUT replacement per stratum — k = 16 docs per " +
        "source with the highest priorities q = w/u (w = n_chars, " +
        "u = md5-hash uniform), plus the per-item unbiased subset-sum " +
        "estimator w-hat = max(w, tau) from the 17th priority. The " +
        "weighted counterpart of p_bottomk_sample on the same bounded " +
        "TopKAgg buffer (map-side partials cap at 17 entries per " +
        "stratum — a billion-row stratum shuffles 17 rows per " +
        "partition). Rank is EXACT integer floor division in a 44-bit " +
        "fixed-point domain (no float rank); tau and w-hat are each one " +
        "exact IEEE step, so both engines emit identical doubles.",
      (s, d) => {
        import s.implicits._
        Sampling.prioritySample(Tables.documents(s, d), "source",
            "doc_id", "n_chars", k = 16)
          .select($"stratum".as("source"), $"rn", $"id".as("doc_id"),
            $"w", $"est")
          .orderBy($"source", $"rn")
      },
      Some(s"""WITH h AS (
             |  SELECT source, doc_id, n_chars AS w,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
             |      1, 11)) AS BIGINT) + 1 AS u
             |  FROM documents),
             |k AS (
             |  SELECT source, doc_id, w, (w * $ScaleL) // u AS pk
             |  FROM h),
             |r AS (
             |  SELECT source, doc_id, w, pk,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY pk DESC, doc_id DESC) AS rn
             |  FROM k),
             |t AS (
             |  SELECT source,
             |    coalesce(max(CASE WHEN rn = 17 THEN pk END), 0)
             |      AS tau_scaled
             |  FROM r GROUP BY source)
             |SELECT r.source, CAST(r.rn AS BIGINT) AS rn, r.doc_id,
             |  CAST(r.w AS BIGINT) AS w,
             |  GREATEST(CAST(r.w AS DOUBLE),
             |    CAST(t.tau_scaled AS DOUBLE) / $ScaleD) AS est
             |FROM r JOIN t ON r.source = t.source
             |WHERE r.rn <= 16
             |ORDER BY r.source, r.rn""".stripMargin)),

    Q("agg_kmv_joinsize",
      "KMV join-cardinality estimation (Beyer et al. SIGMOD 2007 " +
        "threshold estimator): |A JOIN B| = sum fA(v)*fB(v) estimated " +
        "from the k = 64 smallest 44-bit key hashes of the DISTINCT " +
        "key union — the join size is known from two count-aggs and a " +
        "64-row mergeable sketch BEFORE running the join (the 100 TB " +
        "planner's input). Products and their sum are BIGINT; the " +
        "estimate is the fixed two-step IEEE chain (S * 2^44) / tau " +
        "written identically in both engines; the exact size is " +
        "computed alongside so the row itself is the accuracy eval.",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        Sampling.kmvJoinSize(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "view"),
          "user_id", k = 64)
      },
      Some(s"""WITH a AS (SELECT user_id, count(*) AS fa FROM events
             |  WHERE event_type = 'click' GROUP BY user_id),
             |b AS (SELECT user_id, count(*) AS fb FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |ex AS (SELECT CAST(coalesce(sum(a.fa * b.fb), 0) AS BIGINT)
             |    AS exact FROM a JOIN b USING (user_id)),
             |keys AS (SELECT DISTINCT user_id FROM (
             |    SELECT user_id FROM events WHERE event_type = 'click'
             |    UNION ALL
             |    SELECT user_id FROM events WHERE event_type = 'view') u),
             |h AS (SELECT user_id,
             |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
             |      1, 11)) AS BIGINT) + 1 AS h
             |  FROM keys),
             |r AS (SELECT user_id, h,
             |    ROW_NUMBER() OVER (ORDER BY h, user_id DESC) AS rn
             |  FROM h),
             |t AS (SELECT coalesce(max(CASE WHEN rn = 64 THEN h END),
             |    $ScaleL) AS tau_scaled FROM r),
             |s AS (SELECT
             |    CAST(coalesce(sum(coalesce(a.fa, 0) *
             |      coalesce(b.fb, 0)), 0) AS BIGINT) AS s,
             |    count(*) AS sampled_keys
             |  FROM r LEFT JOIN a USING (user_id)
             |    LEFT JOIN b USING (user_id)
             |  WHERE r.rn < 64)
             |SELECT CAST(64 AS BIGINT) AS k, t.tau_scaled,
             |  s.sampled_keys, ex.exact,
             |  (CAST(s.s AS DOUBLE) * $ScaleD)
             |    / CAST(t.tau_scaled AS DOUBLE) AS est,
             |  ((CAST(s.s AS DOUBLE) * $ScaleD)
             |    / CAST(t.tau_scaled AS DOUBLE))
             |    / CAST(ex.exact AS DOUBLE) AS ratio
             |FROM s, t, ex""".stripMargin)),

    Q("o_skyline_pareto",
      "Distributed 2-D skyline (Pareto frontier, maximize price-cents " +
        "and quantity): rows not strictly dominated by any other row. " +
        "Two-level plan — x-range buckets, two in-bucket windows " +
        "(same-x max + running max over strictly-greater x via an " +
        "exact RANGE frame on the negated integer axis), then a " +
        "broadcast of |buckets| per-bucket maxima closes cross-bucket " +
        "domination — no global-ORDER-BY window (one task at 100 TB), " +
        "no self-join. The oracle replays the frontier on DuckDB's own " +
        "unbucketed window semantics.",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_orderkey",
          $"l_linenumber".cast("long").as("l_linenumber"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("x"),
          $"l_quantity".cast("long").as("y"))
        // 64 Ki-cent buckets → ~160 buckets over the fixed price domain:
        // parallelism comes from the bucket count (each bucket sorts
        // independently), so the width must be well under domain/cores
        Relational.skyline2d(li, "x", "y", bucketWidth = 65536L)
          .select($"l_orderkey", $"l_linenumber", $"x", $"y")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""WITH p AS (SELECT l_orderkey,
             |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             |    CAST(l_quantity AS BIGINT) AS y,
             |    -CAST(round(l_extendedprice * 100) AS BIGINT) AS xn
             |  FROM lineitem),
             |w AS (SELECT l_orderkey, l_linenumber, x, y,
             |    max(y) OVER (PARTITION BY x) AS my,
             |    max(y) OVER (ORDER BY xn
             |      RANGE BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING) AS gy
             |  FROM p)
             |SELECT l_orderkey, l_linenumber, x, y FROM w
             |WHERE my <= y AND (gy IS NULL OR gy < y)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("e_mmr_diversify",
      "MMR result diversification (Carbonell & Goldstein SIGIR 1998): " +
        "from each query's 12 nearest candidates, greedily select 4 " +
        "balancing relevance against redundancy (lambda = 0.7) — the " +
        "answer-de-duplication layer over the ANN retriever (a " +
        "near-duplicate corpus otherwise fills the whole top-k with " +
        "copies). The greedy phase is bounded by the CANDIDATE set " +
        "(|Q| x 12 rows + their pairwise sims, checkpointed once), " +
        "cost independent of corpus size; the oracle unrolls the 4 " +
        "steps as chained argmax CTEs over the bit-identical cosine " +
        "expansion with the SAME double literals 0.7/0.3.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.mmrDiversify(emb,
            emb.filter($"vec_id" < 8), "vec_id", "embedding",
            kCand = 12, kSel = 4, mmrLambda = 0.7,
            oneMinusLambda = 0.3)
          .select($"query_id", $"step", $"selected_id",
            round($"score", 6).as("score"))
          .orderBy($"query_id", $"step")
      },
      Some(OracleGen.mmrSql(dim = 64, nQueries = 8, kCand = 12,
        kSel = 4, lambdaLit = "0.7", oneMinusLambdaLit = "0.3"))))
}
