package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-14 additions: the two spec-only scale claims of r13 turned
  * into green oracle rows — MIPS served through the IVF path via the
  * norm-augmentation reduction (previously only the brute baseline
  * had a registry row), and the cross-doc winnowing overlap detector
  * (the actual MOSS use-case: partial-overlap PAIRS, previously the
  * registry stopped at per-doc fingerprint sets).
  */
object Round14Queries {

  /** Cross-doc overlap pairs from winnowing fingerprints — the MOSS
    * detector body over any (doc_id, text) frame: self-join the
    * per-doc fingerprint sets on fp, count shared fingerprints per
    * oriented pair (a < b), keep pairs sharing ≥ `minShared`.
    *
    * BOILERPLATE CAP (the MOSS "legitimately shared code" rule):
    * a fingerprint carried by more docs than the corpus-derived cap
    * (`greatest(64, 8·bitlen(nDocs+1))` — [[graft.dedup.Dedup
    * .bucketCap]], derived IN-PLAN from `capFrom`) is corpus
    * boilerplate, not evidence of pairwise copying, and is excluded
    * from pair formation — the fp key is exactly an LSH bucket key,
    * and an uncapped hot fp is the same O(k²) pair bomb the LSH
    * generators cap. Star-reduction does NOT apply (shared-fp COUNTS
    * are not star-preserved — the r12 verified-pair lesson), so the
    * cap here is a drop, like the co-activity guard: filtering ONE
    * side of the self-join suffices (a pair row needs its left leg
    * from an under-cap fp), which also bounds the join work per hot
    * fp at O(k). df ≥ 2 on the same side is a pure optimization
    * (singleton fps cannot pair). The guard is OBSERVABLE via the
    * `winnow_cap` observe (max_fp_df + over_cap_rows) on the counted
    * branch, which appears once in the plan. Plan shape: ONE exchange
    * on fp feeds the frequency Window AND both self-join sides
    * (both derive from the same repartitioned frame — ReusedExchange),
    * then one (a, b) shuffle for the count rollup.
    */
  private[graft] def winnowOverlap(docs: org.apache.spark.sql.DataFrame,
      minShared: Long): org.apache.spark.sql.DataFrame = {
    // cross-doc matching is on the HASH part only — position (the low
    // 12 bits) is doc-local MOSS metadata, and joining on the combined
    // value would (a) miss every overlap whose shared run sits at
    // different offsets in the two docs and (b) split a boilerplate
    // fingerprint's document frequency across position groups,
    // diluting it under the cap. Distinct per (doc, hash): a hash
    // selected at two positions in one doc is one fingerprint.
    // The index is MATERIALIZED (localCheckpoint — the
    // commonNeighbors/kcore discipline for multi-traversed expensive
    // frames): the gram-explode + md5 + window derivation feeds both
    // self-join sides and would otherwise run twice per query — and
    // that matches MOSS semantics, which builds the fingerprint index
    // once and then queries it (t_winnow_at_rest runs the SAME serve
    // body over the index written to a bucketed at-rest layout).
    val fps = Round13Queries.winnowFingerprints(docs)
      .select(col("doc_id"), expr("fp div 4096").as("fp"))
      .distinct()
      .localCheckpoint()
    // explicit width: the fp index is a few MB at sf0.1, so a bare
    // repartition(col) lets AQE coalesce the exchange that feeds the
    // frequency window AND both self-join legs down to ~1 task (the
    // winnowFingerprints lesson, same round). Width is DATA-SCALED
    // from the checkpointed index's origin stats (r19, guide §2.2):
    // 4 KB/task keeps the benched SF at session width (139 KB at
    // sf0.1 — the shape that measured 1.89×) while tiny indexes stop
    // paying a full-width exchange; at scale it saturates the conf.
    winnowOverlapPairs(fps.repartition(
        graft.ops.Width.scaled(fps, 4L << 10), col("fp")),
      docs.select(col("doc_id")), minShared)
  }

  /** The winnowing-overlap SERVE body: frequency-count + boilerplate
    * cap + fp self-join + shared-count rollup over an ALREADY-BUILT
    * fingerprint index `fps (doc_id, fp)` — shared by the in-flight
    * detector ([[winnowOverlap]], index checkpointed per run) and the
    * at-rest query (index read from a bucketed table layout, whose
    * scan-provided hash partitioning on fp satisfies the frequency
    * Window AND both self-join sides with ZERO exchange). Callers own
    * the fp distribution: pass a frame whose partitioning clusters by
    * fp (repartition or bucketed scan).
    */
  private[graft] def winnowOverlapPairs(
      fps: org.apache.spark.sql.DataFrame,
      capFrom: org.apache.spark.sql.DataFrame,
      minShared: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("fp"))
    val counted = fps
      .withColumn("df", count(lit(1)).over(w))
      .crossJoin(broadcast(graft.dedup.Dedup.inPlanCap(capFrom)))
      .observe("winnow_cap",
        max(col("df")).as("max_fp_df"),
        sum(when(col("df") > col("bkt_cap"), 1L).otherwise(0L))
          .as("over_cap_rows"))
    // both legs of a pair ride the SAME fp (the join key), so the
    // under-cap predicate on both sides is semantically identical to
    // one-sided filtering — and shrinks the build side ~4× (singleton
    // fps dominate a fingerprint index). Both branches derive from
    // the one observed frame: the duplicated CollectMetrics nodes are
    // sameResult (analysis accepts them; the metric fires once).
    val kept = counted
      .filter(col("df") >= 2L && col("df") <= col("bkt_cap"))
    val l = kept.select(col("doc_id").as("doc_a"), col("fp"))
    val r = kept.select(col("doc_id").as("doc_b"),
      col("fp").as("fp2"))
    l.join(r, col("fp") === col("fp2") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def all: Seq[Q] = Seq(

    Q("e_knn_mips_ivf",
      "Similarity: MIPS SERVED through the IVF path — the norm-" +
        "augmentation reduction x' = [x, sqrt(M^2 - |x|^2)], " +
        "q' = [q, 0] (previously spec-pinned only) as a real in-plan " +
        "projection feeding the standard IVF pipeline: M^2 is a " +
        "broadcast 1-row max over the same codegen'd vec_dot the " +
        "brute path scores with (so M^2 - |x|^2 is exactly 0 for the " +
        "longest vector, never epsilon-negative), every augmented " +
        "corpus vector has norm M making augmented-cosine order " +
        "identical to dot order, and cell routing / probe explosion / " +
        "ranked scoring run unchanged over the dim+1 vectors. The " +
        "oracle replays the ENTIRE reduction — the max-norm chain, " +
        "both float augmentations, md5 centroids, argmax cells, " +
        "nProbe routing, final ranks — so the approximate MIPS " +
        "serving path itself is hash-pinned, the way d_semdedup_2level " +
        "pins two-level routing. nProbe = nCells degenerates to exact " +
        "brute-MIPS ranks (spec-pinned vs e_knn_mips).",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.mipsIvfTopK(emb, emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnMipsIvfSql(dim = 64, nCells = 16, nProbe = 4,
        k = 5, maxQueryId = 10))),

    Q("t_winnow_overlap",
      "Cross-doc partial-overlap pairs from winnowing fingerprints — " +
        "the actual MOSS detector (t_winnow_fingerprint stops at " +
        "per-doc sets): match on the HASH part of each fingerprint " +
        "(position is doc-local metadata — matching the combined " +
        "value would only see same-offset overlaps), count shared " +
        "hashes per oriented pair, keep pairs sharing >= 20 — every " +
        "shared hash witnesses a shared run of 8+ normalized chars, " +
        "and any shared run >= 11 chars is guaranteed to surface " +
        "(the winnowing bound), which whole-doc hashing cannot see. " +
        "Hashes carried by more docs than the corpus-derived cap are " +
        "corpus boilerplate and excluded (the MOSS shared-legitimate-" +
        "code rule; also the O(k^2) hot-bucket bound — the fp key IS " +
        "an LSH bucket key), observable via the winnow_cap metric — " +
        "and unlike the LSH caps this one ENGAGES on natural data " +
        "(common phrases: max hash df 3379 vs cap 104 at sf0.1, 1595 " +
        "hashes over cap), so the oracle pins the guard under real " +
        "load, replaying the shared fps chain + the same df window, " +
        "cap formula, one-sided filter, and pair rollup.",
      (s, d) => {
        import s.implicits._
        winnowOverlap(Tables.documents(s, d).select($"doc_id", $"text"),
            minShared = 20L)
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH ${Round13Queries.winnowFpsCtes},
             |fph AS (
             |  SELECT DISTINCT doc_id, fp // 4096 AS fp FROM fps),
             |wcap AS (
             |  SELECT greatest(64, 8 * length(bin(count(*) + 1)))
             |    AS bkt_cap
             |  FROM documents),
             |freq AS (SELECT fp, count(*) AS df FROM fph GROUP BY fp),
             |l AS (
             |  SELECT f.doc_id AS a, f.fp FROM fph f
             |  JOIN freq USING (fp)
             |  WHERE freq.df >= 2
             |    AND freq.df <= (SELECT bkt_cap FROM wcap))
             |SELECT l.a AS doc_a, r.doc_id AS doc_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM l JOIN fph r ON l.fp = r.fp AND l.a < r.doc_id
             |GROUP BY l.a, r.doc_id
             |HAVING count(*) >= 20
             |ORDER BY doc_a, doc_b""".stripMargin)),

    Q("j_interval_autowidth",
      "Keyless interval-containment join with the bucket layout " +
        "DERIVED IN-PLAN (`Relational.intervalJoin`, no-width " +
        "overload): j_interval_bucketized requires the caller to pick " +
        "bucketSeconds — a span outlier turns a too-narrow choice " +
        "into span/width-fold interval replication. Here the layout " +
        "is SPAN-TIERED (r15): every interval lands in its home " +
        "power-of-two tier t = ceil(log2 span) (floored at ~1 s) " +
        "covering <= 2 buckets of width 2^t us BY CONSTRUCTION, and " +
        "points probe the in-plan tier universe (a broadcast 1-row " +
        "collect_set, 1-3 tiers on real data) — so ONE span outlier " +
        "occupies its own coarse tier instead of inflating every " +
        "bucket toward cartesian candidate volume (the r14 verdict's " +
        "perf-weak finding against the previous max-span width). " +
        "Bucket indices are arithmetic right-shifts — exact floor " +
        "division at any epoch magnitude; per-bucket occupancy rides " +
        "the interval_occupancy observe. The join result is " +
        "layout-INVARIANT, so the oracle is DuckDB's IEJoin over the " +
        "naive range predicate — a genuinely different algorithm " +
        "pinning the tiered rewrite pair-for-pair. Windows here are " +
        "11 days over every 1-in-89 order, deliberately unaligned " +
        "with the tier-32/40 bucket grid so straddling is exercised.",
      (s, d) => {
        import s.implicits._
        val iv = Tables.table(s, d, "orders")
          .filter($"o_orderkey" % 89 === 0)
          .select($"o_orderkey".as("order_id"),
            $"o_orderdate".as("win_start"),
            ($"o_orderdate" + expr("INTERVAL 11 DAYS")).as("win_end"))
        val pts = Tables.table(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
        graft.ops.Relational.intervalJoin(pts, iv, "l_shipdate",
            "win_start", "win_end")
          .groupBy($"order_id")
          .agg(count(lit(1)).as("n_ship"),
            min($"l_shipdate").as("first_ship"),
            max($"l_shipdate").as("last_ship"))
          .orderBy($"order_id")
      },
      Some("""WITH iv AS (
             |  SELECT o_orderkey AS order_id, o_orderdate AS win_start,
             |    o_orderdate + INTERVAL 11 DAY AS win_end
             |  FROM orders WHERE o_orderkey % 89 = 0)
             |SELECT order_id, count(*) AS n_ship,
             |  min(l_shipdate) AS first_ship,
             |  max(l_shipdate) AS last_ship
             |FROM iv JOIN lineitem
             |  ON l_shipdate >= win_start AND l_shipdate < win_end
             |GROUP BY order_id ORDER BY order_id""".stripMargin)),
  )
}
