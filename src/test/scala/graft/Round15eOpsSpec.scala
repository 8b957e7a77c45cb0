package graft

import graft.ops.Graph
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 fifth wave: MMR over the IVF serving path (the composition
  * seam) and multi-source BFS hop distance.
  */
class Round15eOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmrDiversifyIvf with all cells probed equals mmrDiversify " +
    "(brute) — the tier swap changes the candidate SOURCE, not the " +
    "greedy semantics") {
    val sf = TestSpark.sf
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 4)
    // nProbe = nCells ⇒ every cell probed ⇒ the IVF candidate set IS
    // the brute candidate set, so the reranked selections must match
    // row-for-row (the e_knn_ivf nProbe=nCells≡brute discipline)
    val brute = Knn.mmrDiversify(emb, q, "vec_id", "embedding",
        kCand = 8, kSel = 3, mmrLambda = 0.7, oneMinusLambda = 0.3)
      .select($"query_id", $"step", $"selected_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ivf = Knn.mmrDiversifyIvf(emb, q, "vec_id", "embedding",
        kCand = 8, kSel = 3, mmrLambda = 0.7, oneMinusLambda = 0.3,
        nCells = 8, nProbe = 8)
      .select($"query_id", $"step", $"selected_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ivf == brute)
  }

  test("mmrDiversifyIvf candidates come from the probed cells only — " +
    "every selection is provably an ivfScored candidate of its query") {
    val sf = TestSpark.sf
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 8)
    val out = Knn.mmrDiversifyIvf(emb, q, "vec_id", "embedding",
        kCand = 8, kSel = 3, mmrLambda = 0.7, oneMinusLambda = 0.3,
        nCells = 8, nProbe = 2)
      .collect()
    assert(out.length == 8 * 3)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val ids = rows.map(_.getLong(2)).toSeq
      assert(ids.distinct == ids, s"query $qid re-selected")
    }
    // PROVENANCE: the (query, candidate) universe of the narrow probe
    // is ivfScored's probed-cell join — a regression silently feeding
    // the reranker brute candidates would select pairs outside it
    val cents = Knn.md5Centroids(emb, "vec_id", "embedding", 8)
    val allowed = Knn.ivfScored(emb, q, "vec_id", "embedding",
        cents.toSeq, nProbe = 2)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    out.foreach { r =>
      assert(allowed.contains((r.getLong(0), r.getLong(2))),
        s"selection ${(r.getLong(0), r.getLong(2))} not in the " +
          "probed-cell candidate universe")
    }
    // and the narrow probe's universe is a STRICT subset of brute's
    // all-pairs universe on this corpus, so the guard has teeth
    val n = emb.count() - 1
    assert(allowed.groupBy(_._1).values.exists(_.size < n),
      "nProbe = 2 of 8 cells unexpectedly covered the whole corpus")
  }

  test("bfsHops: exact hop distances on a path graph, horizon cutoff, " +
    "unreachable nodes absent, seedless graph empty") {
    // path: 17 - 1 - 2 - 3 - 4 - 5 (seed 17), plus disconnected 6 - 7
    val und = Seq((1L, 17L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L)).toDF("a", "b")
    val d = Graph.bfsHops(und, seedMod = 17L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(17L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // horizon: 4 (dist 4) and 5 (dist 5) are beyond maxHops = 3;
    // 6, 7 unreachable from any seed — all absent, not zero/null
    val wide = Graph.bfsHops(und, seedMod = 17L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide(4L) == 4L && wide(5L) == 5L && !wide.contains(6L))
    assert(Graph.bfsHops(und, seedMod = 1000L, maxHops = 3).count() == 0)
  }

  test("bfsHops: min over MULTIPLE seeds wins (a node between two " +
    "seeds takes the shorter side)") {
    // seeds 17 and 34; node 9 is 1 hop from 34 but 3 hops from 17
    val und = Seq((17L, 1L), (1L, 2L), (2L, 9L), (9L, 34L))
      .toDF("a", "b")
    val d = Graph.bfsHops(und, seedMod = 17L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(9L) == 1L) // via seed 34, not 3 via seed 17
    assert(d(2L) == 2L) // min(2 via 17, 2 via 34) — tie is stable
  }
}
