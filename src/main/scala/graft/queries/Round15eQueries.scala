package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-15 fifth wave: the serving-tier composition claim RUN
  * cross-engine (MMR diversification over the IVF path, not just the
  * brute scan) and exact multi-source BFS hop distance from the seed
  * cohort (the discrete companion of g_ppr_seeds).
  */
object Round15eQueries {

  def all: Seq[Q] = Seq(

    Q("e_mmr_ivf",
      "MMR diversification over the IVF SERVING PATH — the " +
        "e_mmr_diversify scaladoc's 'the IVF/LSH tiers slot in " +
        "unchanged' claim RUN cross-engine instead of asserted (the " +
        "t_bm25_decimal discipline): candidates come from ivfTopK's " +
        "probe/score stage (md5 centroids, argmax cells, nProbe = 3 " +
        "of 16 routing) with RAW cosines, and the SAME greedy " +
        "rerank (Knn.mmrRerank, code shared with e_mmr_diversify) " +
        "selects 4 of 12 at lambda = 0.7. The oracle splices the " +
        "knnIvfSql candidate chain verbatim into the shared MMR " +
        "unroll — both the retriever and the diversifier replay " +
        "bit-for-bit.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.mmrDiversifyIvf(emb,
            emb.filter($"vec_id" < 8), "vec_id", "embedding",
            kCand = 12, kSel = 4, mmrLambda = 0.7,
            oneMinusLambda = 0.3, nCells = 16, nProbe = 3)
          .select($"query_id", $"step", $"selected_id",
            round($"score", 6).as("score"))
          .orderBy($"query_id", $"step")
      },
      Some(OracleGen.mmrIvfSql(dim = 64, nQueries = 8, kCand = 12,
        kSel = 4, nCells = 16, nProbe = 3, lambdaLit = "0.7",
        oneMinusLambdaLit = "0.3"))),

    Q("g_bfs_hops",
      "Multi-source BFS hop distance from the seed cohort " +
        "(user_id % 17 = 0) over the co-activity graph, max 4 hops — " +
        "the discrete companion of g_ppr_seeds (PPR ranks by damped " +
        "proximity; this answers 'how far, exactly'). Pure integer " +
        "min-propagation, one dst-shuffle + one min-agg per round; " +
        "after round i the frame holds min-hops <= i EXACTLY, so the " +
        "oracle's fixed-round unroll is the identical object whether " +
        "or not the frontier died earlier. A seedless graph returns " +
        "empty (correct BFS semantics: nothing reachable).",
      (s, d) => {
        import s.implicits._
        graft.ops.Graph.bfsHops(Coactivity.und(s, d), seedMod = 17L,
            maxHops = 4)
          .select($"node".as("user_id"), $"dist")
          .orderBy($"user_id")
      },
      Some {
        def round(i: Int) =
          s"""e$i AS (SELECT bi.dst AS node, d${i - 1}.dist + 1 AS dist
             |  FROM bi JOIN d${i - 1} ON bi.src = d${i - 1}.node),
             |d$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |    SELECT * FROM d${i - 1} UNION ALL SELECT * FROM e$i) u
             |  GROUP BY node)"""
        s"""WITH ${Coactivity.sqlUnd},
           |${Coactivity.sqlBi},
           |nodes AS (SELECT DISTINCT src FROM bi),
           |d0 AS (SELECT src AS node, 0 AS dist FROM nodes
           |  WHERE src % 17 = 0),
           |${round(1)},
           |${round(2)},
           |${round(3)},
           |${round(4)}
           |SELECT node AS user_id, CAST(dist AS BIGINT) AS dist
           |FROM d4 ORDER BY user_id""".stripMargin
      }))
}
