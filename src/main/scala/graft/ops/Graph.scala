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

  /** Bidirectional edge list of an undirected `(a, b)` frame — the one
    * derivation every operator here starts from (checkpoint /
    * repartition decisions stay at the call sites: kcore re-traverses
    * bi every round and cuts+repartitions it, the single-pass ops
    * don't). Callers pass an already-materialized frame when `und` is
    * expensive. */
  private def biOf(und: DataFrame): DataFrame = {
    val s = und.sparkSession
    import s.implicits._
    und.select($"a".as("src"), $"b".as("dst"))
      .unionByName(und.select($"b".as("src"), $"a".as("dst")))
  }

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
    // und feeds BOTH unionByName branches — materialize it first so
    // the (possibly expensive) upstream derivation runs once, then cut
    // bi itself (every round traverses it twice)
    val undM = und.localCheckpoint()
    val bi = biOf(undM).repartition($"src").localCheckpoint()
    def inducedDeg(survivors: DataFrame) =
      bi.join(survivors.select($"src".as("node")), $"src" === $"node")
        .drop("node")
        .join(survivors.select($"src".as("nd")), $"dst" === $"nd")
        .drop("nd")
        .groupBy($"src").agg(count(lit(1)).as("deg"))
    // round 1 peels the FULL graph, where the survivor semi-joins are
    // no-ops — its degree pass runs straight over bi (saves two joins
    // and one checkpoint/count vs starting from an all-nodes frame)
    val degAll = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var n = degAll.count()
    // cur: (src, deg) survivors of the latest peel, deg = induced
    // degree in the PRE-peel graph — at the fixpoint the pre-peel set
    // IS the surviving set, so cur.deg is the within-core degree and
    // the converged path returns it without another pass
    var cur = degAll.filter($"deg" >= k).localCheckpoint()
    var m = cur.count()
    var converged = m == n
    n = m
    var round = 1
    while (round < maxRounds && !converged) {
      val next = inducedDeg(cur).filter($"deg" >= k).localCheckpoint()
      m = next.count()
      converged = m == n
      n = m
      cur = next
      round += 1
    }
    // only an exhausted round budget (un-converged) needs the final
    // induced-degree recompute — cur.deg still describes the pre-peel
    // graph there
    val result = if (converged) cur else inducedDeg(cur)
    result.select($"src".as("node"), $"deg".as("core_deg"))
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
    // three traversals of und (two bi branches + the anti join) —
    // materialize once, inside the op, so no caller has to know
    val undM = und.localCheckpoint()
    val bi = biOf(undM)
    val lowDeg = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
      .filter($"deg" <= maxMidDegree).select($"src".as("mid"))
    val spokes = bi.join(lowDeg, $"src" === $"mid")
      .select($"src".as("v"), $"dst".as("u"))
    spokes.join(spokes.select($"v".as("v2"), $"u".as("w")),
        $"v" === $"v2" && $"u" < $"w")
      .groupBy($"u", $"w").agg(count(lit(1)).as("common"))
      .filter($"common" >= minCommon)
      .join(undM, $"u" === $"a" && $"w" === $"b", "left_anti")
  }

  /** HITS hubs/authorities (Kleinberg, JACM 1999) over the DIRECTED
    * edge frame (a → b), `iters` full mutual-recursion rounds in
    * EXACT integer arithmetic: auth(v) = Σ_{u→v} hub(u), then hub(v)
    * = Σ_{v→u} auth(u), each half-step SUM-normalized back toward a
    * 1e6 total. The paper's L2 normalization is transcendental; sum
    * normalization preserves the ranking and keeps every step integer.
    * The normalizer is `raw div greatest(1, total div 1e6)` — the
    * total is divided DOWN first, so no raw·1e6 product ever forms
    * and the chain is overflow-free at ANY graph size (the same
    * formula on both engines → bit-equal). The trade vs the
    * overflow-prone (raw·1e6) div total is that truncating the
    * DIVISOR first can under-normalize by a relative error up to
    * 1/(total div 1e6) — e.g. total = 1,999,999 gives divisor 1
    * instead of ~2, so half-step totals can drift up to ~2× from
    * the 1e6 target at small totals (shrinking as totals grow).
    * Cross-engine equality and within-step ranking are unaffected;
    * only the nominal normalization target is approximate.
    * Nodes with no in/out edges carry 0 on that side. Runs 2·iters
    * Spark actions at construction (per-half-step localCheckpoint —
    * the CC/kcore/pagerank loop contract); one dst- or src-keyed
    * shuffle per half-step, edges/nodes checkpointed once.
    * Returns (node, hub, auth) ordered by node. */
  def hits(und: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val s = und.sparkSession
    import s.implicits._
    val e = und.select($"a".as("src"), $"b".as("dst"))
      .localCheckpoint()
    val nodes = e.select($"src".as("node"))
      .unionByName(e.select($"dst".as("node")))
      .distinct().localCheckpoint()
    def normalize(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(sum($"raw").as("tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select($"node", expr(
          "coalesce(raw, 0L) div greatest(1L, tot div 1000000L)")
          .as(outCol))
    }
    var hub = nodes.select($"node", lit(1000000L).as("hub"))
    // no a0 exists in the recursion (the oracle has h0 only): auth is
    // first DEFINED by round 1's hub half-step
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val ar = e.join(hub.withColumnRenamed("node", "hn"),
          $"src" === $"hn")
        .groupBy($"dst").agg(sum($"hub").as("raw"))
        .withColumnRenamed("dst", "node")
      auth = normalize(ar, "auth").localCheckpoint()
      val hr = e.join(auth.withColumnRenamed("node", "an"),
          $"dst" === $"an")
        .groupBy($"src").agg(sum($"auth").as("raw"))
        .withColumnRenamed("src", "node")
      hub = normalize(hr, "hub").localCheckpoint()
    }
    hub.join(auth, Seq("node"))
      .select($"node", $"hub", $"auth").orderBy($"node")
  }

  /** Personalized PageRank from a seed set — rank every node by
    * proximity to the seeds (seed-based corpus/user expansion, the
    * curation move behind domain bootstrapping). Same EXACT
    * integer-scaled discipline as the `g_pagerank` query (ranks
    * scaled ×1e6, truncating `div`, damping 0.85), with the teleport
    * mass (1e6·|V| split over the seeds) restarting ONLY at seeds —
    * non-seeds start at 0 and earn rank solely through edges from the
    * seed neighborhood. |V| and |S| are in-plan broadcast scalars;
    * one dst-shuffle per iteration, edges/degrees checkpointed once.
    * `seedMod`: seeds are the nodes with `node % seedMod == 0`
    * (truncated `%`, matching SQL `%` at every sign; callers with an
    * arbitrary seed frame can remap ids first). Requires ≥ 1 seed
    * among the graph's nodes, enforced by an EAGER require at
    * construction (the teleport division hides inside a seed-only
    * CASE branch, so both engines would otherwise lazily skip it and
    * return a meaningless all-zero vector).
    * Returns (node, rank). */
  def pprSeeds(und: DataFrame, seedMod: Long, iters: Int): DataFrame = {
    require(seedMod > 0, s"seedMod must be positive, got $seedMod")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val s = und.sparkSession
    import s.implicits._
    val undM = und.localCheckpoint()
    val bi = biOf(undM).localCheckpoint()
    val deg = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val constsAgg = deg.agg(count(lit(1)).as("nv"),
      sum(when($"src" % seedMod === 0L, 1L).otherwise(0L)).as("ns"))
    // EAGER seed-count guard: the teleport division sits inside a
    // seed-only when/CASE branch, so a zero-seed input would never
    // reach it — both engines would lazily skip the division and
    // return the meaningless all-zero vector. A 1-row driver action
    // on the checkpointed deg is metadata-sized (the Knn centroid
    // precedent) and makes the contract REAL.
    val c0 = constsAgg.head()
    // an EMPTY graph (zero nodes) is fine — the empty rank vector is
    // the correct answer; only a NON-empty seedless graph is the
    // meaningless-all-zero case the guard exists for
    require(c0.getLong(0) == 0L ||
      (!c0.isNullAt(1) && c0.getLong(1) > 0L),
      s"pprSeeds: no seeds (node % $seedMod == 0) among " +
        s"${c0.getLong(0)} nodes — an all-zero rank vector is " +
        "meaningless; pick a seedMod that selects >= 1 node")
    val consts = broadcast(constsAgg)
    def seedTeleport(scale: Long) =
      when($"node" % seedMod === 0L,
        expr(s"(${scale}L * nv) div ns")).otherwise(0L)
    var rank = deg.select($"src".as("node")).crossJoin(consts)
      .select($"node", seedTeleport(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(deg, rank("node") === deg("src"))
        .select($"node", expr("rank div deg").as("c"))
      val inc = bi.join(contrib, $"src" === $"node")
        .groupBy($"dst").agg(sum($"c").as("inc"))
      rank = deg.select($"src".as("node")).crossJoin(consts)
        .join(inc, $"node" === $"dst", "left")
        .select($"node", (seedTeleport(150000L) +
          expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
    }
    rank
  }

  /** Multi-source BFS hop distance from a seed set: for every node
    * reachable within `maxHops` of any seed (node % seedMod == 0),
    * the exact minimum hop count — the discrete companion of
    * [[pprSeeds]] (PPR ranks by damped proximity; this answers "how
    * far, exactly"). Pure integer min-propagation: each round joins
    * the current distance frame to the edge list, adds 1, and takes
    * the per-node min with the previous round — after round i the
    * frame holds min-hops ≤ i EXACTLY, so a fixed-round unroll (the
    * oracle form) is the identical object whether or not the frontier
    * died earlier. One dst-shuffle + one min-agg per round,
    * localCheckpoint per round (the CC/kcore loop discipline). A
    * seedless graph returns the empty frame — correct BFS semantics
    * (nothing is reachable), unlike pprSeeds' meaningless all-zero
    * vector. Returns (node, dist). */
  def bfsHops(und: DataFrame, seedMod: Long, maxHops: Int): DataFrame = {
    require(seedMod > 0, s"seedMod must be positive, got $seedMod")
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val s = und.sparkSession
    import s.implicits._
    val undM = und.localCheckpoint()
    val bi = biOf(undM).localCheckpoint()
    var dist = bi.select($"src".as("node")).distinct()
      .filter($"node" % seedMod === 0L)
      .select($"node", lit(0L).as("dist"))
      .localCheckpoint()
    for (i <- 1 to maxHops) {
      // expand only the FRONTIER (nodes first settled last round):
      // settled nodes can only produce dominated distances the min-agg
      // would discard, so filtering them out changes shuffle volume,
      // never the result — the min-hops <= i invariant is preserved
      val frontier = dist.filter($"dist" === (i - 1L))
      val stepped = bi.join(frontier, $"src" === $"node")
        .select($"dst".as("node"), ($"dist" + 1L).as("dist"))
      dist = dist.unionByName(stepped)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }
}
