package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative / wedge-closure graph operators over an UNDIRECTED edge
  * list `(a, b)` with `a < b`, distinct (the co-activity graph shape
  * every `g_*` query derives; reference analogue: the dense-subgraph
  * and co-occurrence passes a curation pipeline runs on doc-share
  * graphs). Connected components live in
  * [[graft.dedup.Dedup.duplicateClusters]]; this module holds the
  * remaining subgraph shapes: k-core peeling and common-neighbor link
  * prediction.
  */
object Graph {

  /** k-core by iterative peeling: drop every vertex whose degree in
    * the surviving induced subgraph is < k, recompute, repeat. Returns
    * each surviving vertex with its within-core degree
    * (`node`, `core_deg`).
    *
    * Execution contract (the CC-operator discipline): the
    * bidirectional edge list is hash-partitioned by `src` ONCE and
    * localCheckpointed, so every round's induced-degree aggregation
    * reuses that exchange; only the (shrinking) alive set moves per
    * round. Each round cuts the plan with localCheckpoint — the alive
    * frame feeds BOTH endpoint semi-joins, so a lazy loop would double
    * the plan per round. The loop early-exits at the fixpoint: peeling
    * is monotone (alive sets only shrink), so an unchanged survivor
    * COUNT proves an unchanged set. Like `duplicateClusters`, the loop
    * runs actions at construction time by design — an iterate-to-
    * fixpoint op cannot be a single lazy plan.
    *
    * `maxRounds` bounds the loop; because post-fixpoint rounds are
    * no-ops, any `maxRounds` ≥ the convergence depth yields the true
    * k-core, and a fixed-round unroll (the oracle form) yields the
    * identical object whether or not it converged.
    */
  def kcore(und: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val s = und.sparkSession
    import s.implicits._
    val bi = und.select($"a".as("src"), $"b".as("dst"))
      .unionByName(und.select($"b".as("src"), $"a".as("dst")))
      .repartition($"src").localCheckpoint()
    def induced(alive: DataFrame) =
      bi.join(alive, $"src" === $"node").drop("node")
        .join(alive.select($"node".as("nd")), $"dst" === $"nd")
        .drop("nd")
    // round 1 peels the FULL graph, where the alive semi-joins are
    // no-ops — its degree pass runs straight over bi (saves two joins
    // and one checkpoint/count vs starting from an all-nodes frame)
    val degAll = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var n = degAll.count()
    var alive = degAll.filter($"deg" >= k).select($"src".as("node"))
      .localCheckpoint()
    var m = alive.count()
    var converged = m == n
    n = m
    var round = 1
    while (round < maxRounds && !converged) {
      val next = induced(alive)
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= k).select($"src".as("node"))
        .localCheckpoint()
      m = next.count()
      converged = m == n
      n = m
      alive = next
      round += 1
    }
    induced(alive)
      .groupBy($"src").agg(count(lit(1)).as("core_deg"))
      .select($"src".as("node"), $"core_deg")
  }

  /** Common-neighbor link prediction: for every NON-adjacent pair
    * `(u, w)` (oriented u < w) sharing ≥ `minCommon` neighbors, the
    * shared-neighbor count (`u`, `w`, `common`). Wedge enumeration is
    * the Σdeg² self-join, so mid vertices with degree > `maxMidDegree`
    * are excluded FIRST — standard hub suppression (a super-hub's
    * wedges carry no signal, like stop-words in shingling), and the
    * bound that keeps the self-join's per-key fan-out ≤ maxMidDegree²
    * at any scale. Existing edges drop via a co-oriented LEFT ANTI
    * join (both sides a < b by construction).
    */
  def commonNeighbors(und: DataFrame, maxMidDegree: Int,
      minCommon: Long): DataFrame = {
    val s = und.sparkSession
    import s.implicits._
    val bi = und.select($"a".as("src"), $"b".as("dst"))
      .unionByName(und.select($"b".as("src"), $"a".as("dst")))
    val lowDeg = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
      .filter($"deg" <= maxMidDegree).select($"src".as("mid"))
    val spokes = bi.join(lowDeg, $"src" === $"mid")
      .select($"src".as("v"), $"dst".as("u"))
    spokes.join(spokes.select($"v".as("v2"), $"u".as("w")),
        $"v" === $"v2" && $"u" < $"w")
      .groupBy($"u", $"w").agg(count(lit(1)).as("common"))
      .filter($"common" >= minCommon)
      .join(und, $"u" === $"a" && $"w" === $"b", "left_anti")
  }
}
