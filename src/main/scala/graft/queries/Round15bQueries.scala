package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-15 second wave: bottom-k (exact-size) hash sampling — the
  * MERGEABLE uniform-sample primitive the threshold sampler
  * (`p_stratified_sample`) cannot provide — and integer-cleared CUSUM
  * changepoint detection (classic sequential-analysis statistic made
  * hash-exact by scaling the mean out of the float domain).
  */
object Round15bQueries {

  def all: Seq[Q] = Seq(

    Q("p_bottomk_sample",
      "Bottom-k (exact-size) uniform sampling per stratum — the " +
        "MERGEABLE sampling primitive beside the threshold sampler " +
        "p_stratified_sample: the k = 16 docs with the smallest 60-bit " +
        "md5 hashes per lang ARE a uniform-without-replacement sample " +
        "(the bottom-k sketch of the sampling literature), and unlike " +
        "threshold sampling the size is EXACT and the sketch is " +
        "mergeable — per-partition bottom-k buffers combine into the " +
        "global bottom-k with zero approximation loss (the KMV merge " +
        "theorem on the same machinery: the bounded TopKAgg buffer " +
        "caps map-side partials at k entries per group, so a " +
        "billion-row stratum shuffles k rows per partition, never the " +
        "stratum; Spark's native sample() is seed-per-partition and " +
        "changes under repartition — this is replayable on any " +
        "md5-capable engine). Output: (lang, rn, doc_id) — the sample " +
        "itself, rank-ordered by hash.",
      (s, d) => {
        import s.implicits._
        graft.ops.Sampling.bottomKSample(
            Tables.documents(s, d).select($"lang", $"doc_id"),
            "lang", "doc_id", k = 16)
          .orderBy($"lang", $"rn")
      },
      Some("""WITH h AS (
             |  SELECT lang, doc_id,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) AS h
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY h, doc_id DESC) AS rn
             |  FROM h)
             |SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id
             |FROM r WHERE rn <= 16
             |ORDER BY lang, rn""".stripMargin)),

    Q("e_ann_recall_eval",
      "ANN QUALITY EVALUATION in-plan — the harness an engine serving " +
        "approximate search must itself provide: per-query recall@5 " +
        "of the IVF path (nProbe = 3 of 16) against brute-force exact " +
        "ranks, as one LEFT join of the two rank lists (both k-rows-" +
        "per-query — broadcast-sized at any corpus scale; the cost " +
        "lives in the rankers, which scale via their registered " +
        "paths). Hit counts are BIGINT; recall pays ONE double " +
        "division. The oracle replays BOTH pipelines (the verbatim " +
        "brute + IVF CTE chains coexisting in one WITH) so the " +
        "evaluation itself is hash-exact cross-engine — recall " +
        "numbers a 100 TB serving deployment would alert on cannot " +
        "drift between engines.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter($"vec_id" < 10)
        val brute = graft.similarity.Knn
          .bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
          .select($"query_id", $"neighbor_id")
        val ivf = graft.similarity.Knn
          .ivfTopK(emb, qs, "vec_id", "embedding", k = 5, nCells = 16,
            nProbe = 3)
          .select($"query_id".as("iq"), $"neighbor_id".as("inb"))
        brute.join(ivf,
            $"query_id" === $"iq" && $"neighbor_id" === $"inb", "left")
          .groupBy($"query_id")
          .agg(count($"inb").as("n_hits"))
          .select($"query_id", $"n_hits",
            ($"n_hits".cast("double") / lit(5.0)).as("recall_at_k"))
          .orderBy($"query_id")
      },
      Some(OracleGen.annRecallSql(dim = 64, nCells = 16, nProbe = 3,
        k = 5, maxQueryId = 10))),

    Q("w_cusum_changepoint",
      "CUSUM changepoint detection per entity — the classic " +
        "sequential-analysis statistic S_i = prefix_i − i·mean over an " +
        "ordered value series, with the changepoint at argmax |S_i| — " +
        "made hash-exact by INTEGER CLEARING (the gini/bm25 " +
        "discipline): multiplying through by n removes the mean's " +
        "division, so the scaled statistic n·prefix_i − i·total is " +
        "pure BIGINT over value-cents, and only the reported " +
        "normalized score pays ONE double division at the end. Per " +
        "user (>= 20 events): order by (ts, event_id), one window " +
        "partition computes prefix/i/n/total together, a rank window " +
        "on (|S| desc, ts asc, event_id asc) picks the changepoint " +
        "deterministically — both windows share the user_id exchange. " +
        "At scale this is one shuffle per entity stream, state " +
        "bounded by the window frame, no iteration.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
        val wPick = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy($"abs_s".desc, $"ts".asc, $"event_id".asc)
        Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts",
            round($"value" * 100).cast("long").as("cents"))
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("prefix", sum($"cents").over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("total", sum($"cents").over(wAll))
          .filter($"n" >= 20L)
          .withColumn("s", $"n" * $"prefix" - $"i" * $"total")
          .withColumn("abs_s", abs($"s"))
          .withColumn("rk", row_number().over(wPick))
          .filter($"rk" === 1)
          .select($"user_id", $"n",
            $"i".as("cp_index"), $"ts".as("cp_ts"), $"s".as("cusum_scaled"),
            // the only float op: the conventionally-normalized score
            // |S| / n as one division of exact integers
            ($"abs_s".cast("double") / $"n".cast("double"))
              .as("cusum_score"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(ROW_NUMBER() OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS BIGINT) AS i,
             |    SUM(cents) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS UNBOUNDED PRECEDING) AS prefix,
             |    COUNT(*) OVER (PARTITION BY user_id) AS n,
             |    SUM(cents) OVER (PARTITION BY user_id) AS total
             |  FROM e),
             |sc AS (
             |  SELECT user_id, event_id, ts, i, n,
             |    n * prefix - i * total AS s,
             |    abs(n * prefix - i * total) AS abs_s
             |  FROM s WHERE n >= 20),
             |pick AS (
             |  SELECT *,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY abs_s DESC, ts ASC, event_id ASC) AS rk
             |  FROM sc)
             |SELECT user_id, CAST(n AS BIGINT) AS n,
             |  i AS cp_index, ts AS cp_ts,
             |  CAST(s AS BIGINT) AS cusum_scaled,
             |  CAST(abs_s AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_score
             |FROM pick WHERE rk = 1
             |ORDER BY user_id""".stripMargin)),
  )
}
