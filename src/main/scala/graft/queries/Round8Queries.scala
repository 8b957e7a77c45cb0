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
  )
}
