package graft.queries

import graft.Tables
import graft.ops.RobustStats
import org.apache.spark.sql.functions._

/** Round-15 fourth wave: robust statistics for data curation —
  * median/MAD outlier detection and percentile winsorization, both in
  * EXACT rank-based integer arithmetic (no interpolated quantiles, no
  * float medians — the two-middle-sum trick keeps every statistic a
  * BIGINT) — plus personalized PageRank (seed-set corpus expansion) in
  * the g_pagerank integer-scaled discipline.
  */
object Round15dQueries {

  def all: Seq[Q] = Seq(

    Q("w_mad_outliers",
      "Robust outlier detection per entity: median + MAD (median " +
        "absolute deviation) instead of mean/stddev (w_zscore) — one " +
        "wild value cannot drag the center the way it drags a mean. " +
        "EXACT integer arithmetic end-to-end via the two-middle-sum " +
        "trick: med2 = the sum of the two middle cents values (twice " +
        "the median; for odd n both indices hit the same row), " +
        "dev2 = |2v - med2| (twice each deviation), mad4 = the " +
        "two-middle-sum of dev2 (four times the MAD), and the classic " +
        "|v - med| > 3 MAD rule becomes the BIGINT comparison " +
        "2*dev2 > 3*mad4. COUNT-COLLAPSED order statistics (the " +
        "RobustStats scale shape): the input reduces to (group, value, " +
        "count) via a partial-agg groupBy before any exchange, ranks " +
        "come from cumulative counts over the DISTINCT-VALUE frame, " +
        "and a giant group costs its distinct values, never a " +
        "single-task row sort. The oracle replays the NAIVE per-row " +
        "rank-window formulation — an independent derivation of the " +
        "same statistics.",
      (s, d) => {
        import s.implicits._
        RobustStats.madOutliers(
          Tables.events(s, d).select($"user_id",
            expr("CAST(round(value * 100) AS BIGINT)").as("v")),
          "user_id", "v", obsName = "robust_stats_collapse_mad")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events),
             |r AS (
             |  SELECT user_id, event_id, v,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY v, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM e),
             |m AS (
             |  SELECT user_id, event_id, v, n,
             |    max(CASE WHEN rn = (n + 1) // 2 THEN v END)
             |      OVER (PARTITION BY user_id) +
             |    max(CASE WHEN rn = n // 2 + 1 THEN v END)
             |      OVER (PARTITION BY user_id) AS med2
             |  FROM r),
             |dv AS (
             |  SELECT user_id, event_id, v, n, med2,
             |    abs(v * 2 - med2) AS dev2,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY abs(v * 2 - med2), event_id) AS rd
             |  FROM m),
             |md AS (
             |  SELECT user_id, n, med2, dev2,
             |    max(CASE WHEN rd = (n + 1) // 2 THEN dev2 END)
             |      OVER (PARTITION BY user_id) +
             |    max(CASE WHEN rd = n // 2 + 1 THEN dev2 END)
             |      OVER (PARTITION BY user_id) AS mad4
             |  FROM dv)
             |SELECT user_id, CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(med2) AS BIGINT) AS med2,
             |  CAST(max(mad4) AS BIGINT) AS mad4,
             |  CAST(sum(CASE WHEN dev2 * 2 > mad4 * 3 THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_outliers
             |FROM md GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    Q("curate_winsorize",
      "Percentile winsorization per group — the standard heavy-tail " +
        "clamp before aggregating noisy per-doc metrics: values below " +
        "the 5th / above the 95th percentile are clamped to those " +
        "percentiles. NEAREST-RANK percentiles (p05 at rank " +
        "ceil(n/20), p95 at rank ceil(19n/20)) — exact BIGINT order " +
        "statistics, NOT interpolated quantiles (engine interpolation " +
        "rules differ; a rank picks a real value identically " +
        "everywhere). COUNT-COLLAPSED like w_mad_outliers: event_type " +
        "has only 5 groups, so a per-row rank window would sort " +
        "millions of rows in 5 tasks at scale — the (group, value, " +
        "count) reduction makes the window sort distinct VALUES and " +
        "the clamp a weighted sum. Oracle = the naive per-row " +
        "rank-window formulation, independently derived.",
      (s, d) => {
        import s.implicits._
        RobustStats.winsorize(
            Tables.events(s, d).select($"event_type",
              expr("CAST(round(value * 100) AS BIGINT)").as("v")),
            "event_type", "v",
            loNum = 1L, hiNum = 19L, den = 20L,
            obsName = "robust_stats_collapse_winsorize")
          .withColumnRenamed("p_lo", "p05")
          .withColumnRenamed("p_hi", "p95")
      },
      Some("""WITH e AS (
             |  SELECT event_type, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events),
             |r AS (
             |  SELECT event_type, event_id, v,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY v, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e),
             |p AS (
             |  SELECT event_type, v, n,
             |    max(CASE WHEN rn = (n + 19) // 20 THEN v END)
             |      OVER (PARTITION BY event_type) AS p05,
             |    max(CASE WHEN rn = (19 * n + 19) // 20 THEN v END)
             |      OVER (PARTITION BY event_type) AS p95
             |  FROM r)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(p05) AS BIGINT) AS p05,
             |  CAST(max(p95) AS BIGINT) AS p95,
             |  CAST(sum(v) AS BIGINT) AS raw_sum,
             |  CAST(sum(least(greatest(v, p05), p95)) AS BIGINT)
             |    AS clamped_sum,
             |  CAST(sum(CASE WHEN v < p05 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_lo,
             |  CAST(sum(CASE WHEN v > p95 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_hi
             |FROM p GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("g_ppr_seeds",
      "Personalized PageRank from a seed set (user_id % 17 = 0) over " +
        "the co-activity graph — seed-based corpus/user expansion " +
        "(rank every node by proximity to a trusted seed cohort; the " +
        "curation move behind domain bootstrapping). Same EXACT " +
        "integer-scaled discipline as g_pagerank (ranks scaled 1e6, " +
        "truncating div), with the teleport mass (1e6·|V| split over " +
        "the seeds, damping 0.85) restarting ONLY at seeds — " +
        "non-seeds start at 0 and earn rank solely through edges from " +
        "the seed neighborhood. |V| and |S| are in-plan broadcast " +
        "scalars; 3 iterations, one dst-shuffle each, edges/degrees " +
        "checkpointed once; a zero-seed graph fails an EAGER require " +
        "at construction (the division hides in a seed-only CASE " +
        "branch both engines would lazily skip). `%` (not pmod) " +
        "matches the oracle at every sign; user ids are " +
        "non-negative here.",
      (s, d) => {
        import s.implicits._
        graft.ops.Graph.pprSeeds(Coactivity.und(s, d), seedMod = 17L,
            iters = 3)
          .select($"node".as("user_id"), $"rank").orderBy($"user_id")
      },
      Some {
        def round(i: Int) =
          s"""c$i AS (
             |  SELECT bi.dst AS node, sum(r${i - 1}.rank // deg.deg) AS inc
             |  FROM bi JOIN r${i - 1} ON bi.src = r${i - 1}.node
             |  JOIN deg ON bi.src = deg.src GROUP BY bi.dst),
             |r$i AS (
             |  SELECT deg.src AS node,
             |    (CASE WHEN deg.src % 17 = 0
             |       THEN (150000 * ns.nv) // ns.ns ELSE 0 END) +
             |    (85 * COALESCE(c$i.inc, 0)) // 100 AS rank
             |  FROM deg CROSS JOIN ns
             |  LEFT JOIN c$i ON deg.src = c$i.node)"""
        s"""WITH ${Coactivity.sqlUnd},
           |${Coactivity.sqlBi},
           |deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
           |ns AS (SELECT count(*) AS nv,
           |    sum(CASE WHEN src % 17 = 0 THEN 1 ELSE 0 END) AS ns
           |  FROM deg),
           |r0 AS (SELECT deg.src AS node,
           |    CASE WHEN deg.src % 17 = 0
           |      THEN (1000000 * ns.nv) // ns.ns ELSE 0 END AS rank
           |  FROM deg CROSS JOIN ns),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT node AS user_id, CAST(rank AS BIGINT) AS rank
           |FROM r3 ORDER BY user_id""".stripMargin
      }))
}
